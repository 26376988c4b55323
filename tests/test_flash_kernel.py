"""Differential tests: Pallas flash kernels vs the dense jnp oracle.

On the CPU test rig these use the Pallas interpreter; the same tests pass
compiled on a real TPU (see .claude/skills/verify/SKILL.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variantformer_tpu.ops import attention as attn_xla
from variantformer_tpu.ops import flash
from variantformer_tpu.ops.alibi import alibi_slopes


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("seq,heads,dim", [(64, 4, 16), (200, 2, 48)])
def test_self_attention_matches_oracle(seq, heads, dim):
    keys = jax.random.split(jax.random.key(0), 3)
    b = 3
    q, k, v = (_rand(keys[i], (b, seq, heads, dim)) for i in range(3))
    kv_len = jnp.asarray([seq, seq // 2, 1], jnp.int32)
    slopes = jnp.asarray(alibi_slopes(heads))
    scale = dim ** -0.5
    ref = attn_xla.self_attention(q, k, v, kv_len, slopes, scale)
    out = flash.self_attention(q, k, v, kv_len, slopes, scale)
    # only rows < kv_len are contract-valid
    for i, n in enumerate([seq, seq // 2, 1]):
        np.testing.assert_allclose(
            np.asarray(out[i, :n]), np.asarray(ref[i, :n]), rtol=2e-3, atol=2e-3
        )


def test_cross_attention_matches_oracle():
    keys = jax.random.split(jax.random.key(1), 3)
    b, sq, sk, heads, dim = 2, 40, 120, 4, 48
    q = _rand(keys[0], (b, sq, heads, dim))
    k = _rand(keys[1], (b, sk, heads, dim))
    v = _rand(keys[2], (b, sk, heads, dim))
    kv_len = jnp.asarray([120, 77], jnp.int32)
    scale = dim ** -0.5
    ref = attn_xla.cross_attention(q, k, v, None, kv_len, scale)
    out = flash.cross_attention(q, k, v, None, kv_len, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_shared_kv_matches_broadcast():
    keys = jax.random.split(jax.random.key(2), 3)
    b, t, sq, sk, heads, dim = 2, 3, 16, 64, 2, 32
    q = _rand(keys[0], (b, t, sq, heads, dim))
    k = _rand(keys[1], (b, sk, heads, dim))
    v = _rand(keys[2], (b, sk, heads, dim))
    kv_len = jnp.asarray([64, 33], jnp.int32)
    scale = dim ** -0.5
    out = flash.cross_attention_shared_kv(q, k, v, kv_len, scale)
    # oracle: per-tissue dense attention against the shared kv
    for ti in range(t):
        ref = attn_xla.cross_attention(q[:, ti], k, v, None, kv_len, scale)
        np.testing.assert_allclose(
            np.asarray(out[:, ti]), np.asarray(ref), rtol=2e-3, atol=2e-3
        )


def test_bf16_inputs():
    keys = jax.random.split(jax.random.key(3), 3)
    b, s, heads, dim = 2, 128, 4, 64
    q, k, v = (_rand(keys[i], (b, s, heads, dim), jnp.bfloat16) for i in range(3))
    kv_len = jnp.asarray([128, 100], jnp.int32)
    slopes = jnp.asarray(alibi_slopes(heads))
    scale = dim ** -0.5
    ref = attn_xla.self_attention(q, k, v, kv_len, slopes, scale)
    out = flash.self_attention(q, k, v, kv_len, slopes, scale)
    for i, n in enumerate([128, 100]):
        np.testing.assert_allclose(
            np.asarray(out[i, :n], np.float32),
            np.asarray(ref[i, :n], np.float32),
            rtol=3e-2, atol=3e-2,
        )


def test_model_forward_pallas_matches_xla():
    """Whole-model check: impl='pallas' (interpreter) vs impl='xla'."""
    from tests.test_model_smoke import tiny_batch, tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    out_xla = seq2gene_forward(params, batch, cfg, impl="xla")
    out_pallas = seq2gene_forward(params, batch, cfg, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_pallas.pred_expression),
        np.asarray(out_xla.pred_expression),
        rtol=2e-2, atol=2e-2,
    )


def test_flash_attention_differentiable():
    """Gradients flow through the pallas path (custom VJP via oracle recompute)."""
    keys = jax.random.split(jax.random.key(9), 3)
    b, s, heads, dim = 2, 32, 2, 16
    q, k, v = (_rand(keys[i], (b, s, heads, dim)) for i in range(3))
    kv_len = jnp.asarray([32, 20], jnp.int32)
    slopes = jnp.asarray(alibi_slopes(heads))
    scale = dim ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash.self_attention(q, k, v, kv_len, slopes, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attn_xla.self_attention(q, k, v, kv_len, slopes, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3)


def test_flash_under_head_sharded_shard_map():
    """TP pattern: the flash kernel runs per-shard under jax.shard_map with
    heads split across the 'model' axis (check_vma=False required for
    pallas out_shapes in jax 0.9)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P

    devices = np.asarray(jax.devices()[:4])
    if devices.size < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(devices.reshape(4), ("model",))
    b, s, heads, dim = 2, 32, 8, 16
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(ks[i], (b, s, heads, dim)) for i in range(3))
    kv_len = jnp.full((b,), s, jnp.int32)
    slopes = jnp.asarray(alibi_slopes(heads))
    scale = dim ** -0.5

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(None, None, "model", None),) * 3 + (P(), P("model")),
        out_specs=P(None, None, "model", None),
    )
    def sharded(q, k, v, kv_len, slopes):
        return flash.self_attention(q, k, v, kv_len, slopes, scale)

    out = sharded(q, k, v, kv_len, slopes)
    ref = attn_xla.self_attention(q, k, v, kv_len, slopes, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
