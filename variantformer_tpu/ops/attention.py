"""Batched masked attention with optional symmetric ALiBi bias.

This is the XLA (jnp) implementation — the production per-layer attention
path (XLA's fused attention beat hand-written per-layer Pallas kernels at
every model shape; the Pallas wins live in the fused whole-stack kernels,
ops/fused_encoder.py and ops/fused_modulator.py). Semantics replicate
flash-attn's non-causal varlen path as used by the reference
(/root/reference/seq2gene/modules/layers.py:328-488):

  * softmax scale = 1/sqrt(head_dim) over the *true* head dim,
  * ALiBi bias = -slope_h * |i - j| over within-sequence positions,
  * padding is suffix-only, so a per-sample valid-key count fully describes
    the mask and ALiBi positions are unchanged by padding.

Rows beyond a sample's query length compute garbage; callers must never read
them (registry-token pooling and position gathers only touch valid rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attend(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, H, D]
    v: jax.Array,  # [B, Sk, H, D]
    kv_len: jax.Array | None,  # [B] int32, number of valid (prefix) keys
    slopes: jax.Array | None,  # [H] f32 ALiBi slopes, or None
    scale: float,
    softmax_dtype=jnp.float32,
) -> jax.Array:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=softmax_dtype
    )
    scores = scores * scale
    if slopes is not None:
        qi = jnp.arange(sq, dtype=softmax_dtype)[:, None]
        kj = jnp.arange(sk, dtype=softmax_dtype)[None, :]
        dist = jnp.abs(qi - kj)  # [Sq, Sk]
        scores = scores - slopes.astype(softmax_dtype)[None, :, None, None] * dist
    if kv_len is not None:
        key_valid = jnp.arange(sk)[None, :] < kv_len[:, None]  # [B, Sk]
        scores = jnp.where(key_valid[:, None, None, :], scores, MASK_VALUE)
    weights = jax.nn.softmax(scores.astype(softmax_dtype), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=softmax_dtype,
    )
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def self_attention(q, k, v, kv_len, slopes, scale):
    """q/k/v: [B, S, H, D]."""
    return _attend(q, k, v, kv_len, slopes, scale)


@functools.partial(jax.jit, static_argnames=("scale",))
def cross_attention(q, k, v, q_len, kv_len, scale):
    """q: [B, Sq, H, D]; k/v: [B, Sk, H, D]. q_len unused (suffix garbage ok)."""
    del q_len
    return _attend(q, k, v, kv_len, None, scale)
