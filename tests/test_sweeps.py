"""Sweep-driver tests on the synthetic genome: genome-wide streaming and
saturation mutagenesis invariants."""

import numpy as np
import pandas as pd
import pytest

import jax

from tests.test_api_end_to_end import _tiny_cfg, fixture_env  # noqa: F401
from variantformer_tpu.api.sweeps import genome_wide_expression, saturation_scan
from variantformer_tpu.api.variantprocessor import VariantProcessor
from variantformer_tpu.api.vcfprocessor import VCFProcessor
from variantformer_tpu.models.init import init_seq2gene


@pytest.fixture(scope="module")
def vp(fixture_env):
    cfg = _tiny_cfg(vocab_size=500)
    proc = VariantProcessor(sources=fixture_env["sources"], config=cfg)
    proc.set_params(init_seq2gene(jax.random.key(0), cfg))
    return proc


def test_genome_wide_streaming(fixture_env, tmp_path):
    cfg = _tiny_cfg(vocab_size=500)
    proc = VCFProcessor(sources=fixture_env["sources"], config=cfg)
    proc.set_params(init_seq2gene(jax.random.key(0), cfg))
    out_dir = tmp_path / "sweep"
    result = genome_wide_expression(
        proc, fixture_env["vcf"], tissues=["tissue0", "tissue5"],
        out_dir=str(out_dir), shard_rows=2,
    )
    assert result is None
    shards = sorted(out_dir.glob("shard_*.parquet"))
    assert shards
    df = pd.concat([pd.read_parquet(s) for s in shards])
    assert set(df["gene_id"]) == {"GENEPLUS.1", "GENEMINUS.1"}
    assert set(df["tissue"]) == {"tissue0", "tissue5"}
    assert np.all(np.isfinite(df["predicted_expression"]))


def test_genome_wide_in_memory(fixture_env):
    cfg = _tiny_cfg(vocab_size=500)
    proc = VCFProcessor(sources=fixture_env["sources"], config=cfg)
    proc.set_params(init_seq2gene(jax.random.key(0), cfg))
    df = genome_wide_expression(proc, None, tissues=["tissue1"])
    assert len(df) == 2


def test_saturation_scan(vp, fixture_env):
    # scan a 6bp slice inside GENEPLUS's second CRE [300, 380)
    df = saturation_scan(
        vp, "chr1", start=318, end=323, gene_id="GENEPLUS.1",
        tissues=["tissue0"], variants_per_batch=4,
    )
    # 6 positions x 3 alts x 2 zygosities x 1 tissue
    assert len(df) == 6 * 3 * 2
    assert set(df["zygosity"]) == {"1", "2"}
    assert np.all(np.isfinite(df["log2fc"]))
    # hom edits must move expression away from ref for at least some variants
    hom = df[df["zygosity"] == "2"]
    assert (np.abs(hom["expression"] - hom["ref_expression"]) > 1e-9).any()
    # all share the same reference prediction
    assert hom["ref_expression"].nunique() == 1


def _spy_forward(proc):
    """Wrap a VCFProcessor's _forward, recording each dispatch's donor count."""
    seen = []
    orig = proc._forward

    def spy(batch):
        seen.append(int(batch.gene_tokens.shape[0]))
        return orig(batch)

    proc._forward = spy
    return seen


def test_genome_wide_pads_trailing_group_to_canonical_shape(fixture_env):
    """2 genes at batch_size=4: the single (partial) group must dispatch at
    the canonical donor count — a smaller trailing batch would be a fresh
    device shape, i.e. a fresh multi-minute compile mid-sweep."""
    cfg = _tiny_cfg(vocab_size=500)
    proc = VCFProcessor(sources=fixture_env["sources"], config=cfg)
    proc.set_params(init_seq2gene(jax.random.key(0), cfg))
    seen = _spy_forward(proc)
    df = genome_wide_expression(proc, None, tissues=["tissue1"], batch_size=4)
    assert seen == [4]
    assert len(df) == 2  # pad rows sliced off
    assert df["gene_id"].nunique() == 2


def test_saturation_scan_single_device_shape(vp, fixture_env):
    """Every scan dispatch — including the shared-reference call and the
    partial trailing batch — must run at one canonical donor count."""
    seen = _spy_forward(vp._vp)
    df = saturation_scan(
        vp, "chr1", start=318, end=322, gene_id="GENEPLUS.1",
        tissues=["tissue0"], variants_per_batch=4,
    )
    # 5 positions x 3 alts = 15 variants -> ref call + 3 full + 1 partial
    # batch, all at D = 2*4
    assert set(seen) == {8} and len(seen) == 5
    assert len(df) == 5 * 3 * 2
