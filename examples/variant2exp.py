"""variant2exp — variant-effect prediction (VEP) and eQTL scoring.

Equivalent of the reference's variant2exp notebook flow: each variant is
scored as ref/het/hom against nearby genes, pivoted into {POP}-{zyg}-exp
columns, and reduced to log2 fold-change eQTL scores.
"""

import sys
import tempfile

import jax
import pandas as pd

from _common import artifacts_present, build_processor, real_sources, synthetic_env


def main():
    from variantformer_tpu.api.variantprocessor import VariantProcessor
    from variantformer_tpu.models.init import init_seq2gene

    if artifacts_present():
        sources, cfg = real_sources()
        vp = VariantProcessor(sources=sources, config=cfg)
        vp.load_model()
        var_df = pd.DataFrame(
            {
                "chrom": ["chr19"], "pos": [44908684], "ref": ["T"], "alt": ["C"],
                "tissue": ["brain - cortex,liver"],
                "gene_id": ["ENSG00000130203"],
            }
        )
        vcf, sample = None, None
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
        print("[synthetic mode]")

    out_dir = tempfile.mkdtemp(prefix="vep_")
    long_df = vp.predict(var_df, out_dir, vcf_path=vcf, sample_name=sample)
    scores = vp.format_scores(long_df)
    print("\npivoted scores:\n", scores.head().to_string())
    eqtl = vp.eqtl_scores(scores)
    print("\neQTL log2fc columns:", [c for c in eqtl.columns if "log2fc" in c])
    print(eqtl.head().to_string())
    return eqtl


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
