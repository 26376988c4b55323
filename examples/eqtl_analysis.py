"""eqtl_analysis — per-tissue Spearman correlation of VariantFormer
aggregated log2fc scores against eQTL-catalog effect sizes.

Equivalent of the reference's eqtl_analysis notebook: given a dataframe of
eQTL associations (variant, gene, tissue, slope), score each variant with the
model and report per-tissue Spearman r between VF-agg-log2fc and the catalog
slopes (the quality benchmark compared against AlphaGenome in the reference).
"""

import sys
import tempfile

import numpy as np
import pandas as pd
from scipy import stats

from _common import artifacts_present, build_processor, real_sources, synthetic_env


def spearman_by_tissue(scored: pd.DataFrame, slope_col: str, score_col: str):
    out = []
    for tissue, group in scored.groupby("tissues"):
        if len(group) >= 3:
            r, p = stats.spearmanr(group[score_col], group[slope_col])
            out.append({"tissue": tissue, "spearman_r": r, "p": p, "n": len(group)})
    return pd.DataFrame(out)


def main():
    import jax

    from variantformer_tpu.api.variantprocessor import VariantProcessor
    from variantformer_tpu.models.init import init_seq2gene

    if artifacts_present():
        sources, cfg = real_sources()
        vp = VariantProcessor(sources=sources, config=cfg)
        vp.load_model()
        catalog = pd.read_parquet(
            sources.af_path.replace("1KG_af_hg38_tables", "eqtl_catalog.parquet")
        )
        score_col = "VF-agg-log2fc-weighted"
    else:
        sources, cfg, extras = synthetic_env("/tmp/vfx_example")
        vp = VariantProcessor(sources=sources, config=cfg)
        vp.set_params(init_seq2gene(jax.random.key(0), cfg))
        # A multi-association catalog (SNVs spread across GENE1.1's cis
        # span) so the per-tissue Spearman statistic actually exercises
        # (n >= 3 per tissue), not just the scoring plumbing.
        from variantformer_tpu.utils.fasta import FastaReader

        fa = FastaReader(sources.fasta_path)
        flip = {"A": "G", "C": "T", "G": "A", "T": "C"}
        rows = []
        rng = np.random.default_rng(7)
        for pos in (260, 340, 520, 740, 900, 1200):
            ref = fa.fetch("chr1", pos - 1, pos).upper()
            if ref not in "ACGT":
                continue
            rows.append(
                {"chrom": "chr1", "pos": pos, "ref": ref, "alt": flip[ref],
                 "tissue": "tissue0,tissue2",
                 "slope": float(rng.normal(0.0, 0.5))}
            )
        catalog = pd.DataFrame(rows)
        score_col = "VF-SAMPLE-2-exp-log2fc"
        print(f"[synthetic mode: demo catalog of {len(catalog)} associations]")

    var_df = catalog[["chrom", "pos", "ref", "alt", "tissue"]]
    kwargs = {}
    if not artifacts_present():
        kwargs = {"vcf_path": extras["vcf"], "sample_name": "S1"}
    long_df = vp.predict(var_df, tempfile.mkdtemp(), **kwargs)
    scores = vp.format_scores(long_df)
    # log2fc columns (VF-...-log2fc / VF-agg-log2fc-weighted) come from
    # eqtl_scores in both modes; SAMPLE mode needs no AF table.
    scores = vp.eqtl_scores(scores)
    scored = scores.merge(
        catalog.assign(
            variant_id=catalog[["chrom", "pos", "ref", "alt"]].astype(str).agg("_".join, axis=1)
        )[["variant_id", "slope"]],
        on="variant_id",
    )
    result = spearman_by_tissue(scored, "slope", score_col)
    print(result.to_string() if len(result) else scored.to_string())
    return scored


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
