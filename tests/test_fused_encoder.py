"""Fused whole-encoder kernel vs the layered path (Pallas interpreter)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from variantformer_tpu.config import WindowEncoderConfig
from variantformer_tpu.models.core import AttnSpec
from variantformer_tpu.models.init import init_window_encoder
from variantformer_tpu.models.seq2reg import encode_windows
from variantformer_tpu.ops.alibi import alibi_slopes
from variantformer_tpu.ops.fused_encoder import fused_window_encoder


def _setup(seed=0, n=10, l=24):
    cfg = WindowEncoderConfig(
        vocab_size=60, embedding_dim=64, num_heads=4, num_layers=3,
        ffn_hidden_dim=128, use_context=False, token_length=l,
    )
    params = init_window_encoder(jax.random.key(seed), cfg)
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(4, 60, (n, l)), jnp.int32)
    tok_len = jnp.asarray(rng.integers(1, l + 1, n), jnp.int32)
    return cfg, params, tokens, tok_len


def test_fused_matches_layered():
    cfg, params, tokens, tok_len = _setup()
    ctx = jnp.zeros((tokens.shape[0],), jnp.int32)
    ref = encode_windows(
        params, tokens, tok_len, ctx, cfg, AttnSpec(4, 16), jnp.bfloat16
    )
    out = encode_windows(
        params, tokens, tok_len, ctx, cfg, AttnSpec(4, 16, impl="fused"),
        jnp.bfloat16,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_fused_window_padding():
    """N not a multiple of the window block must still match."""
    cfg, params, tokens, tok_len = _setup(n=5)
    x_emb = params["token_embedding"][tokens]
    slopes = jnp.asarray(alibi_slopes(4))
    out8 = fused_window_encoder(
        x_emb, tok_len, params["layers"], slopes, 16 ** -0.5, 4, window_block=8
    )
    out2 = fused_window_encoder(
        x_emb, tok_len, params["layers"], slopes, 16 ** -0.5, 4, window_block=2
    )
    np.testing.assert_allclose(
        np.asarray(out8, np.float32), np.asarray(out2, np.float32),
        rtol=1e-2, atol=1e-2,
    )
    assert out8.shape == (5, 64)


def test_ffn_row_chunking_invariant():
    """ffn_chunks only bounds the FFN's VMEM transient; the math (and hence
    the output) must be bit-comparable to the unchunked kernel."""
    cfg, params, tokens, tok_len = _setup(n=8)
    x_emb = params["token_embedding"][tokens]
    slopes = jnp.asarray(alibi_slopes(4))
    outs = [
        fused_window_encoder(
            x_emb, tok_len, params["layers"], slopes, 16 ** -0.5, 4,
            window_block=8, ffn_chunks=ch,
        )
        for ch in (1, 2, 4)
    ]
    for other in outs[1:]:
        np.testing.assert_array_equal(
            np.asarray(outs[0], np.float32), np.asarray(other, np.float32)
        )


def test_dual_stack_matches_separate():
    """One dual-stack launch must equal two single-stack launches: the
    window-block index selects the weight stack (A blocks then B blocks)."""
    from variantformer_tpu.ops.fused_encoder import fused_window_encoder_dual

    cfg, params_a, tokens_a, len_a = _setup(seed=0, n=10)
    _, params_b, tokens_b, len_b = _setup(seed=1, n=7)
    slopes = jnp.asarray(alibi_slopes(4))
    xa = params_a["token_embedding"][tokens_a]
    xb = params_b["token_embedding"][tokens_b]
    ref_a = fused_window_encoder(
        xa, len_a, params_a["layers"], slopes, 16 ** -0.5, 4, window_block=4
    )
    ref_b = fused_window_encoder(
        xb, len_b, params_b["layers"], slopes, 16 ** -0.5, 4, window_block=4
    )
    out_a, out_b = fused_window_encoder_dual(
        xa, len_a, params_a["layers"], xb, len_b, params_b["layers"],
        slopes, 16 ** -0.5, 4, window_block=4,
    )
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(ref_a))
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(ref_b))
    assert out_a.shape == (10, 64) and out_b.shape == (7, 64)


# ---------------------------------------------------------------------------
# Backward (custom VJP) — recompute Pallas backward vs the XLA path's grads
# ---------------------------------------------------------------------------


def _grad_setup(seed=0, n=10, l=24):
    from variantformer_tpu.ops.alibi import alibi_slopes

    cfg, params, tokens, tok_len = _setup(seed=seed, n=n, l=l)
    rng = np.random.default_rng(seed + 100)
    cot = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)
    slopes = jnp.asarray(alibi_slopes(4))
    return cfg, params, tokens, tok_len, cot, slopes


@pytest.mark.mid
def test_vjp_grads_match_xla_path():
    """d(layers) and d(x_emb) from the fused VJP must match the layered XLA
    path's gradients to bf16 tolerance (the kernels are bf16-internal)."""
    from variantformer_tpu.ops.fused_encoder import fused_window_encoder_diff

    cfg, params, tokens, tok_len, cot, slopes = _grad_setup()
    ctx = jnp.zeros((tokens.shape[0],), jnp.int32)
    scale = 16 ** -0.5

    def loss_fused(layers, x_emb):
        out = fused_window_encoder_diff(x_emb, tok_len, layers, slopes, scale, 4)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_xla(layers, emb_table):
        p = {**params, "layers": layers, "token_embedding": emb_table}
        out = encode_windows(
            p, tokens, tok_len, ctx, cfg, AttnSpec(4, 16), jnp.bfloat16
        )
        return jnp.sum(out.astype(jnp.float32) * cot)

    x_emb = params["token_embedding"][tokens].astype(jnp.bfloat16)
    v1, (gl_f, gx_f) = jax.value_and_grad(loss_fused, argnums=(0, 1))(
        params["layers"], x_emb
    )
    v2, (gl_x, gemb_x) = jax.value_and_grad(loss_xla, argnums=(0, 1))(
        params["layers"], params["token_embedding"]
    )
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)

    # per-leaf relative error on the layer grads
    flat_f = jax.tree.leaves(gl_f)
    flat_x = jax.tree.leaves(gl_x)
    assert len(flat_f) == len(flat_x)
    for gf, gx in zip(flat_f, flat_x):
        gf = np.asarray(gf, np.float32)
        gx = np.asarray(gx, np.float32)
        # both sides are bf16-internal, so elementwise comparison is noisy;
        # relative L2 error is the robust agreement metric
        rel = np.linalg.norm(gf - gx) / max(1e-6, np.linalg.norm(gx))
        assert rel < 5e-2, rel

    # d(x_emb): scatter the XLA embedding-table grad back to token positions
    # is lossy (duplicate tokens accumulate), so compare through a direct
    # x_emb grad of the XLA path instead.
    def loss_xla_emb(x_emb_in):
        # re-run the layered path on explicit embeddings via a one-hot-free
        # trick: temporarily swap encode_windows' gather for the given array.
        from variantformer_tpu.models import core

        spec = AttnSpec(4, 16)
        x = x_emb_in
        sl = slopes

        def layer_body(x, layer_p):
            h = core.self_attention_block(
                layer_p["mixer"], core.layer_norm(layer_p["norm1"], x),
                tok_len, sl, spec, jnp.bfloat16,
            )
            h = h + x
            out = core.geglu_ffn(
                layer_p, core.layer_norm(layer_p["norm2"], h), jnp.bfloat16
            )
            return out + x, None

        x, _ = jax.lax.scan(layer_body, x, params["layers"])
        pos = jnp.arange(x.shape[1])[None, :]
        valid = (pos < tok_len[:, None]).astype(jnp.float32)[..., None]
        pooled = (x.astype(jnp.float32) * valid).sum(1) / jnp.maximum(
            tok_len.astype(jnp.float32), 1.0
        )[:, None]
        return jnp.sum(pooled * cot)

    gx_ref = jax.grad(loss_xla_emb)(x_emb)
    gf = np.asarray(gx_f, np.float32)
    gr = np.asarray(gx_ref, np.float32)
    rel = np.linalg.norm(gf - gr) / max(1e-6, np.linalg.norm(gr))
    assert rel < 5e-2, rel


@pytest.mark.mid
def test_vjp_pad_rows_zero_grad():
    """Token rows beyond tok_len must receive exactly zero d(x_emb): masked
    keys give p=0 and pooling ignores them; everything else is row-local."""
    from variantformer_tpu.ops.fused_encoder import fused_window_encoder_diff

    cfg, params, tokens, tok_len, cot, slopes = _grad_setup(n=6)
    x_emb = params["token_embedding"][tokens].astype(jnp.bfloat16)
    scale = 16 ** -0.5

    def loss(x):
        out = fused_window_encoder_diff(x, tok_len, params["layers"],
                                        slopes, scale, 4)
        return jnp.sum(out.astype(jnp.float32) * cot)

    dx = np.asarray(jax.grad(loss)(x_emb), np.float32)
    lens = np.asarray(tok_len)
    for i in range(dx.shape[0]):
        assert np.all(dx[i, lens[i]:] == 0.0), f"window {i} pad rows leak grad"
        # valid rows must carry signal
        assert np.abs(dx[i, : lens[i]]).max() > 0


@pytest.mark.slow
def test_dual_vjp_matches_two_single():
    """The dual-stack VJP is the same kernel math with a two-slot weight
    gradient — it must agree with two single-stack calls bit-for-bit."""
    from variantformer_tpu.ops.fused_encoder import (
        fused_window_encoder_diff,
        fused_window_encoder_dual_diff,
    )
    from variantformer_tpu.ops.alibi import alibi_slopes

    _, pa_full, _, _ = _setup(seed=0, n=9)
    _, pb_full, _, _ = _setup(seed=1, n=6)
    pa, pb = pa_full["layers"], pb_full["layers"]
    rng = np.random.default_rng(0)
    na, nb, l = 9, 6, 24
    xa = jnp.asarray(rng.standard_normal((na, l, 64)), jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((nb, l, 64)), jnp.bfloat16)
    la = jnp.asarray(rng.integers(1, l + 1, na), jnp.int32)
    lb = jnp.asarray(rng.integers(1, l + 1, nb), jnp.int32)
    cota = jnp.asarray(rng.standard_normal((na, 64)), jnp.float32)
    cotb = jnp.asarray(rng.standard_normal((nb, 64)), jnp.float32)
    slopes = jnp.asarray(alibi_slopes(4))
    scale = 16 ** -0.5

    def loss_dual(pa_, xa_, pb_, xb_):
        oa, ob = fused_window_encoder_dual_diff(
            xa_, la, pa_, xb_, lb, pb_, slopes, scale, 4
        )
        return (jnp.sum(oa.astype(jnp.float32) * cota)
                + jnp.sum(ob.astype(jnp.float32) * cotb))

    def loss_sep(pa_, xa_, pb_, xb_):
        oa = fused_window_encoder_diff(xa_, la, pa_, slopes, scale, 4)
        ob = fused_window_encoder_diff(xb_, lb, pb_, slopes, scale, 4)
        return (jnp.sum(oa.astype(jnp.float32) * cota)
                + jnp.sum(ob.astype(jnp.float32) * cotb))

    g1 = jax.grad(loss_dual, argnums=(0, 1, 2, 3))(pa, xa, pb, xb)
    g2 = jax.grad(loss_sep, argnums=(0, 1, 2, 3))(pa, xa, pb, xb)
    for t1, t2 in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
