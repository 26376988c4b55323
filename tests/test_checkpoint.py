"""Orbax checkpoint round trip + config sidecar."""

import jax
import numpy as np

from variantformer_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from variantformer_tpu.models.init import init_seq2gene


def test_round_trip(tmp_path):
    from tests.test_model_smoke import tiny_config

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    save_checkpoint(tmp_path / "ckpt", params, cfg)
    loaded, loaded_cfg = load_checkpoint(tmp_path / "ckpt")
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert loaded_cfg.seq2gene.emb_dim == cfg.seq2gene.emb_dim
    assert loaded_cfg.window_encoder.num_layers == cfg.window_encoder.num_layers


def test_sharded_restore_onto_mesh(tmp_path):
    """load_checkpoint(mesh=...) restores each leaf directly onto its DP/TP
    sharding (no full-tree materialization on one device) with values equal
    to a plain restore and the head/FFN leaves carrying 'model' specs."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    from jax.sharding import PartitionSpec as P

    from tests.test_model_smoke import tiny_config
    from variantformer_tpu.parallel.mesh import make_mesh

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    save_checkpoint(tmp_path / "ckpt", params, cfg)
    mesh = make_mesh(devices=jax.devices()[:8])
    loaded, _ = load_checkpoint(tmp_path / "ckpt", mesh=mesh)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    w = loaded["gene_layers"]["ffn_in"]["w"]
    assert w.sharding.spec == P(None, None, "model")
