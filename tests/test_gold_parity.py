"""Gold-artifact regression tests (the reference's primary correctness oracle,
SURVEY.md §4): run the released 1.2B checkpoint on the bundled example data
and compare against the H100-generated gold parquets at the reference's
tolerances. Skipped when the ~43GB artifact set is absent (zero-egress rigs);
on artifact-equipped machines this is the definitive parity gate.

Reference tolerances (tests/test_vep.py, BASELINE.md):
  * per-population log2fc eQTL scores: atol=1e-3
  * expression (VCF vs precomputed paths): atol=1
  * cross-processor zygosity-0 expression: atol=0.1
"""

import numpy as np
import pandas as pd
import pytest

from variantformer_tpu.utils.assets import artifacts_dir

# Real VCFs (HG00096) can contain REF-mismatch records; the reference's
# pipeline voids the WHOLE region on one (bcftools non-zero exit -> raw
# reference slice). Force the compat mode so gold comparisons are
# semantics-equal — the repo's default ("skip") keeps strictly more variants.
# Fixture-scoped (NOT module-level os.environ): pytest imports every module
# at collection time, so an import-time set would leak into the whole suite
# (observed: test_consensus_fixtures' deviation test failing in-suite only).
@pytest.fixture(autouse=True)
def _compat_consensus(monkeypatch):
    monkeypatch.setenv("VFX_CONSENSUS_REF_MISMATCH", "region_fallback")


BASE = artifacts_dir()
REQUIRED = [
    "v4_pcg_epoch11_checkpoint.pth",
    "pretrained_tokenizers_checkpoint.pth",
    "GRCh38_no_alt_analysis_set_GCA_000001405.15.fasta.gz",
    "HG00096.vcf.gz",
    "all_genes_v1_pcg_gencodeV24.csv",
]

pytestmark = pytest.mark.skipif(
    not all((BASE / f).exists() for f in REQUIRED),
    reason="released artifacts not present (run data/download_artifacts.py)",
)


@pytest.fixture(scope="module")
def processor():
    from variantformer_tpu.api.vcfprocessor import DataSources, VCFProcessor

    sources = DataSources(
        fasta_path=str(BASE / "GRCh38_no_alt_analysis_set_GCA_000001405.15.fasta.gz"),
        gencode_path=str(BASE / "all_genes_v1_pcg_gencodeV24.csv"),
        checkpoint_path=str(BASE / "v4_pcg_epoch11_checkpoint.pth"),
        tokenizer_checkpoint_path=str(BASE / "pretrained_tokenizers_checkpoint.pth"),
        af_path=str(BASE / "1KG_af_hg38_tables"),
    )
    proc = VCFProcessor(sources=sources)
    proc.load_model()
    return proc


def test_vcf2exp_smoke(processor):
    """vcf2exp on the reference's own test query (tests/test_model.py)."""
    query = pd.DataFrame(
        {
            "gene_id": ["ENSG00000000457.13"] * 2,
            "tissues": ["whole blood,K562,thyroid,artery - aorta"] * 2,
        }
    )
    out = processor.predict(str(BASE / "HG00096.vcf.gz"), query)
    assert len(out) == 2
    preds = np.stack(out["predicted_expression"].to_numpy())
    assert preds.shape == (2, 4)
    assert np.all(np.isfinite(preds)) and np.all(preds >= 0)
    # the two identical query rows must agree exactly
    np.testing.assert_allclose(preds[0], preds[1], rtol=1e-5)


@pytest.mark.parametrize("mode", ["legacy", "fastpath"])
def test_eqtl_gold_log2fc(processor, mode, monkeypatch):
    """Full eQTL pipeline vs gold parquet a0063c48.pq (reference
    tests/test_vep.py:191-332): per-population log2fc atol=1e-3.

    Both dispatch paths must hit gold: "legacy" scores every variant as a
    full ref/het/hom triple; "fastpath" is the production configuration —
    ref-once cache (het/hom pair dispatches + host-side ref gathers),
    window-dedup pools, cross-variant pair batching (k=2), and bf16
    embedding transfer."""
    gold_path = BASE / "a0063c48.pq"
    if not gold_path.exists():
        pytest.skip("gold parquet a0063c48.pq absent")
    from variantformer_tpu.api.variantprocessor import VariantProcessor

    fast = mode == "fastpath"
    monkeypatch.setenv("VFX_VEP_REF_ONCE", "1" if fast else "0")
    monkeypatch.setenv("VFX_VEP_DEDUP", "1" if fast else "0")

    gold = pd.read_parquet(gold_path)
    vp = VariantProcessor(sources=processor.sources, config=processor.config)
    vp.set_params(processor._params, processor.config)

    var_cols = {"chr": "chrom"} if "chr" in gold.columns else {}
    var_df = (
        gold.rename(columns=var_cols)[["chrom", "pos", "ref", "alt", "tissues", "genes"]]
        .drop_duplicates(subset=["chrom", "pos", "ref", "alt"])
        .rename(columns={"tissues": "tissue", "genes": "gene_id"})
        .head(3)
    )
    import tempfile

    long_df = vp.predict(
        var_df, tempfile.mkdtemp(), variants_per_dispatch=2 if fast else 1
    )
    scores = vp.eqtl_scores(vp.format_scores(long_df))
    merged = scores.merge(
        gold, on=["variant_id", "genes", "tissues"], suffixes=("", "_gold")
    )
    assert len(merged) > 0
    for col in [c for c in scores.columns if c.endswith("-log2fc")]:
        gold_col = col if col in gold.columns else col + "_gold"
        if gold_col in merged.columns:
            np.testing.assert_allclose(
                merged[col].to_numpy(float),
                merged[gold_col].to_numpy(float),
                atol=1e-3,
            )


def test_cross_processor_consistency(processor):
    """VariantProcessor zygosity-0 vs VCFProcessor expression, atol=0.1
    (reference tests/test_vep.py:334-406)."""
    from variantformer_tpu.api.variantprocessor import VariantProcessor

    gene = "ENSG00000000457.13"
    tissues = "whole blood,thyroid"
    gencode = processor.get_genes()
    row = gencode[gencode["gene_id"] == gene].iloc[0]
    pos = int(row["start"]) + 500
    from variantformer_tpu.utils.fasta import FastaReader

    fasta = FastaReader(processor.sources.fasta_path)
    ref = fasta.fetch(row["chromosome"], pos - 1, pos).upper()
    alt = {"A": "G", "C": "T", "G": "A", "T": "C"}[ref]
    var_df = pd.DataFrame(
        {"chrom": [row["chromosome"]], "pos": [pos], "ref": [ref], "alt": [alt],
         "tissue": [tissues], "gene_id": [gene.split(".")[0]]}
    )
    vp = VariantProcessor(sources=processor.sources, config=processor.config)
    vp.set_params(processor._params, processor.config)
    import tempfile

    long_df = vp.predict(var_df, tempfile.mkdtemp())
    ref0 = long_df[
        (long_df["population"] == "REF_HG38") & (long_df["zygosity"] == "0")
    ]

    query = pd.DataFrame({"gene_id": [gene], "tissues": [tissues]})
    exp = processor.predict(None, query)
    vc_preds = dict(zip(exp.iloc[0]["tissue_names"], exp.iloc[0]["predicted_expression"]))
    for _, r in ref0.iterrows():
        assert abs(r["gene_exp"] - vc_preds[r["tissues"]]) < 0.1
