"""vcf2exp — predict tissue-specific gene expression from a donor VCF.

Equivalent of the reference's vcf2exp notebook flow (notebooks/vcf2exp.py):
query rows of (gene_id, comma-separated tissues) against a VCF produce
per-tissue expression predictions and gene-tissue embeddings.
"""

import sys
import time

import pandas as pd

from _common import artifacts_present, build_processor


def main():
    proc, extras = build_processor()
    if artifacts_present():
        query = pd.DataFrame(
            {
                "gene_id": ["ENSG00000130203.9"],  # APOE
                "tissues": ["brain - cortex,liver,whole blood"],
            }
        )
    else:
        query = pd.DataFrame(
            {"gene_id": ["GENE1.1", "GENE2.1"], "tissues": ["tissue0,tissue3"] * 2}
        )
    print("query:\n", query, "\n")
    t0 = time.time()
    out = proc.predict(extras["vcf"], query)
    print(f"predictions completed in {time.time() - t0:.1f}s\n")
    for _, row in out.iterrows():
        for name, value in zip(row["tissue_names"], row["predicted_expression"]):
            print(f"  {row['gene_id']:16s} {name:24s} {value:.4f}")

    # Reactive single-file explorer (the marimo-app equivalent): gene
    # selector + anatomagram + sortable tissue table, all client-side.
    from variantformer_tpu.api.webapp import vcf2exp_app

    app = vcf2exp_app(out, "/tmp/vcf2exp_app.html")
    print(f"\ninteractive explorer: {app}")
    return out


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
