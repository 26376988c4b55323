"""Fused whole-encoder kernel vs the layered path (Pallas interpreter)."""

import jax
import jax.numpy as jnp
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
