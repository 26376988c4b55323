"""snp_indel_predictions — VCF authoring + SNP/indel expression effects.

Equivalent of the reference's snp_indel_predictions notebook
(/root/reference/notebooks/snp_indel_predictions.ipynb): author a VCF from a
variant dataframe (SNPs, an insertion, a deletion), merge a second variant
set into it, predict expression with the merged VCF vs the plain reference
genome, and report the per-(gene, tissue) deltas.
"""

import sys
import tempfile
from pathlib import Path

import pandas as pd

from _common import artifacts_present, build_processor


def _variant_sets(proc, extras):
    """(set1 with SNPs+indels, set2 to merge, query_df) for either mode."""
    from variantformer_tpu.utils.fasta import FastaReader

    fasta = FastaReader(proc.sources.fasta_path)
    if artifacts_present():
        # APOE-adjacent variants, as in the reference notebook.
        def ref_at(pos, n=1):
            return fasta.fetch("chr19", pos - 1, pos - 1 + n)

        set1 = pd.DataFrame(
            [
                {"chrom": "chr19", "pos": 44900754, "ref": ref_at(44900754),
                 "alt": "G", "GT": "0/1"},
                {"chrom": "chr19", "pos": 44906754, "ref": ref_at(44906754),
                 "alt": "T", "GT": "1/1"},
                {"chrom": "chr19", "pos": 44908684, "ref": ref_at(44908684),
                 "alt": "C", "GT": "0/1"},
                # insertion + deletion
                {"chrom": "chr19", "pos": 44905000, "ref": ref_at(44905000),
                 "alt": ref_at(44905000) + "AG", "GT": "0/1"},
                {"chrom": "chr19", "pos": 44907000, "ref": ref_at(44907000, 3),
                 "alt": ref_at(44907000), "GT": "1/1"},
            ]
        )
        set2 = pd.DataFrame(
            [{"chrom": "chr19", "pos": 44910754, "ref": ref_at(44910754),
              "alt": "A" if ref_at(44910754) != "A" else "C", "GT": "0/1"}]
        )
        query = pd.DataFrame(
            {"gene_id": ["ENSG00000130203.9"],
             "tissues": ["whole blood,liver"]}
        )
        return set1, set2, query

    def ref_at(pos, n=1):
        return fasta.fetch("chr1", pos - 1, pos - 1 + n)

    def snp_alt(base):
        return {"A": "G", "C": "T", "G": "A", "T": "C"}[base.upper()]

    # Variants inside GENE1's CRE/window neighbourhood on the 3kb genome.
    set1 = pd.DataFrame(
        [
            {"chrom": "chr1", "pos": 350, "ref": ref_at(350),
             "alt": snp_alt(ref_at(350)), "GT": "0/1"},          # het SNP
            {"chrom": "chr1", "pos": 720, "ref": ref_at(720),
             "alt": snp_alt(ref_at(720)), "GT": "1/1"},          # hom SNP
            {"chrom": "chr1", "pos": 600, "ref": ref_at(600),
             "alt": ref_at(600) + "AG", "GT": "0/1"},            # insertion
            {"chrom": "chr1", "pos": 900, "ref": ref_at(900, 3),
             "alt": ref_at(900), "GT": "1/1"},                   # deletion
        ]
    )
    set2 = pd.DataFrame(
        [{"chrom": "chr1", "pos": 1000, "ref": ref_at(1000),
          "alt": snp_alt(ref_at(1000)), "GT": "0/1"}]
    )
    query = pd.DataFrame({"gene_id": ["GENE1.1"], "tissues": ["tissue0,tissue3"]})
    return set1, set2, query


def main():
    proc, extras = build_processor()
    out_dir = Path(tempfile.mkdtemp(prefix="snp_indel_"))

    set1, set2, query = _variant_sets(proc, extras)
    print(f"variant set 1 ({len(set1)} records: SNPs + indels):")
    print(set1.to_string(index=False))

    vcf1 = proc.create_vcf_from_variant(set1, str(out_dir / "set1.vcf.gz"))
    print(f"\nwrote {vcf1}")
    vcf_merged = proc.create_vcf_from_variant(
        set2, str(out_dir / "merged.vcf.gz"), vcf_path=vcf1
    )
    from variantformer_tpu.utils.vcf import VCFReader

    n1 = sum(len(v[1]) for v in VCFReader(vcf1, use_index=False)._by_chrom.values())
    n2 = sum(
        len(v[1]) for v in VCFReader(vcf_merged, use_index=False)._by_chrom.values()
    )
    print(f"merged {vcf_merged}: {n1} -> {n2} records")
    assert n2 == n1 + len(set2)

    pred_var = proc.predict(str(vcf_merged), query)
    pred_ref = proc.predict(None, query)
    rows = []
    for (_, rv), (_, rr) in zip(pred_var.iterrows(), pred_ref.iterrows()):
        for i, name in enumerate(rv["tissue_names"]):
            v, r = float(rv["predicted_expression"][i]), float(
                rr["predicted_expression"][i]
            )
            rows.append(
                {"gene_id": rv["gene_id"], "tissue": name,
                 "with_variants": v, "reference": r, "delta": v - r}
            )
    deltas = pd.DataFrame(rows)
    print("\nvariant-vs-reference expression:\n", deltas.to_string(index=False))
    return deltas


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
