"""Serving-export round trip: the forward serializes to a portable
StableHLO artifact (jax.export) and a deserialized copy reproduces the
direct forward exactly."""

import dataclasses

import jax
import numpy as np
import pytest

from tests.test_model_smoke import tiny_batch, tiny_config
from variantformer_tpu.config import PrecisionPolicy
from variantformer_tpu.models.init import init_seq2gene
from variantformer_tpu.models.seq2gene import seq2gene_forward


def test_export_roundtrip_exact(tmp_path):
    from variantformer_tpu.api.serving import export_forward, load_exported

    cfg = dataclasses.replace(
        tiny_config(), precision=PrecisionPolicy(compute_dtype="float32")
    )
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    direct = seq2gene_forward(params, batch, cfg, impl="xla")

    path = export_forward(cfg, params, batch, tmp_path / "serving.bin")
    served = load_exported(path)(params, batch)
    for name in direct._fields:
        if getattr(direct, name) is None:  # optional stream outputs
            continue
        np.testing.assert_array_equal(
            np.asarray(getattr(served, name)),
            np.asarray(getattr(direct, name)),
            err_msg=name,
        )

    # Shape contract: a different batch shape must be rejected, not
    # silently mis-executed.
    bad = tiny_batch(np.random.default_rng(1), d=3)
    with pytest.raises(ValueError):
        load_exported(path)(params, bad)


def test_export_cross_platform_tpu(tmp_path):
    """A TPU artifact cross-builds from this (CPU-forced) host — the deploy
    path: lower once wherever, run on the fleet."""
    from variantformer_tpu.api.serving import export_forward

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    path = export_forward(
        cfg, params, batch, tmp_path / "serving_tpu.bin", platforms=("tpu",)
    )
    assert (tmp_path / "serving_tpu.bin").stat().st_size > 1000
