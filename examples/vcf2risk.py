"""vcf2risk — Alzheimer's-disease risk from a donor VCF.

Equivalent of the reference's vcf2risk notebook flow: run vcf2exp to get
gene-tissue embeddings, then apply the per-(gene, tissue) gradient-boosted
tree predictors. Without the released predictors, a demo GBT is fitted on
the spot so the flow runs end to end.
"""

import sys
import tempfile

import numpy as np

from _common import artifacts_present, build_processor


def main():
    from variantformer_tpu.api.ad_risk import ADriskFromVCF, TreeEnsemble

    proc, extras = build_processor()
    if artifacts_present():
        ad = ADriskFromVCF(proc)
        out = ad(extras["vcf"], ["ENSG00000130203.9"], [7])
    else:
        # demo predictor over the tiny model's embedding width
        from sklearn.ensemble import GradientBoostingClassifier

        emb_dim = proc.config.seq2gene.emb_dim
        rng = np.random.default_rng(0)
        x = rng.standard_normal((300, emb_dim)).astype(np.float32)
        y = (x[:, 0] > 0).astype(int)
        ens = TreeEnsemble.from_sklearn_gbm(
            GradientBoostingClassifier(n_estimators=10, max_depth=3, random_state=0)
            .fit(x, y)
        )
        path = tempfile.mktemp(suffix=".npz")
        ens.save(path)

        class DemoManifest:
            def get_file_path(self, gene_id, tissue_id):
                return path

        ad = ADriskFromVCF(proc, manifest=DemoManifest())
        out = ad(extras["vcf"], ["GENE1.1"], [0])
        print("[synthetic mode: demo GBT predictor]")
    print(out[["gene_id", "tissue_name", "ad_risk"]].to_string())

    from variantformer_tpu.api.webapp import vcf2risk_app

    app = vcf2risk_app(out, "/tmp/vcf2risk_app.html")
    print(f"interactive risk explorer: {app}")
    return out


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
