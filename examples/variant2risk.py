"""variant2risk — in-silico mutation effect on Alzheimer's-disease risk.

Equivalent of the reference's variant2risk notebook
(/root/reference/notebooks/variant2risk.ipynb): run the VariantProcessor with
a donor VCF so the in-silico edit is placed in the sample's genotype context,
take the per-(gene, tissue) embeddings at zygosity 0 (no edit) and 2
(homozygous edit), and score both with the per-(gene, tissue) GBT AD-risk
predictors — the risk delta is the in-silico mutation effect.
"""

import sys
import tempfile

import jax
import numpy as np
import pandas as pd

from _common import artifacts_present, build_processor, real_sources, synthetic_env


def _demo_predictor(emb_dim: int) -> str:
    """Fit a small GBT so the synthetic flow runs end to end."""
    from sklearn.ensemble import GradientBoostingClassifier

    from variantformer_tpu.api.ad_risk import TreeEnsemble

    rng = np.random.default_rng(0)
    x = rng.standard_normal((300, emb_dim)).astype(np.float32)
    y = (x[:, 0] > 0).astype(int)
    ens = TreeEnsemble.from_sklearn_gbm(
        GradientBoostingClassifier(
            n_estimators=10, max_depth=3, random_state=0
        ).fit(x, y)
    )
    path = tempfile.mktemp(suffix=".npz")
    ens.save(path)
    return path


def main():
    from variantformer_tpu.api.ad_risk import load_predictor
    from variantformer_tpu.api.variantprocessor import VariantProcessor
    from variantformer_tpu.models.init import init_seq2gene

    if artifacts_present():
        sources, cfg = real_sources()
        vp = VariantProcessor(sources=sources, config=cfg)
        vp.load_model()
        var_df = pd.DataFrame(
            {"chrom": ["chr19"], "pos": [44908684], "ref": ["T"], "alt": ["C"],
             "tissue": ["brain - cortex"], "gene_id": ["ENSG00000130203"]}
        )
        from variantformer_tpu.utils.assets import artifacts_dir

        vcf, sample = str(artifacts_dir() / "HG00096.vcf.gz"), "HG00096"
        predictor_path = None  # resolved per (gene, tissue) via the manifest
    else:
        sources, cfg, extras = synthetic_env("/tmp/vfx_example")
        vp = VariantProcessor(sources=sources, config=cfg)
        vp.set_params(init_seq2gene(jax.random.key(0), cfg))
        chrom, pos, ref, alt = extras["variant"]
        var_df = pd.DataFrame(
            {"chrom": [chrom], "pos": [pos], "ref": [ref], "alt": [alt],
             "tissue": ["tissue0,tissue2"]}
        )
        vcf, sample = extras["vcf"], "S1"
        predictor_path = _demo_predictor(cfg.seq2gene.emb_dim)
        print("[synthetic mode: demo GBT predictor]")

    out_dir = tempfile.mkdtemp(prefix="variant2risk_")
    preds = vp.predict(var_df, out_dir, vcf_path=vcf, sample_name=sample)

    # zygosity 0 = sample context without the edit; 2 = homozygous edit.
    baseline = preds[(preds["zygosity"] == "0") & (preds["sample_name"] == sample)]
    edited = preds[(preds["zygosity"] == "2") & (preds["sample_name"] == sample)]

    def risk_for(row):
        if predictor_path is not None:
            ens = load_predictor(predictor_path)
        else:
            from variantformer_tpu.api.ad_risk import ADrisk

            return float(
                ADrisk(row.genes, vp.tissue_vocab[row.tissues])(
                    np.asarray(row.gene_emb).reshape(1, -1)
                )[0]
            )
        return float(ens(np.asarray(row.gene_emb).reshape(1, -1))[0])

    rows = []
    for (_, b), (_, e) in zip(baseline.iterrows(), edited.iterrows()):
        assert b.genes == e.genes and b.tissues == e.tissues
        r0, r2 = risk_for(b), risk_for(e)
        rows.append(
            {"gene": b.genes, "tissue": b.tissues,
             "risk_no_edit": r0, "risk_hom_edit": r2, "delta": r2 - r0}
        )
    out = pd.DataFrame(rows)
    print("\nin-silico AD-risk effect:\n", out.to_string(index=False))
    return out


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
