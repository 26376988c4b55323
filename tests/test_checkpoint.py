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
