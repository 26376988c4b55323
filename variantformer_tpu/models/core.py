"""Core functional building blocks: projections, norms, GeGLU, attention blocks.

Parameters are plain pytrees (nested dicts of jnp arrays). Linear weights are
stored [in, out] (the transpose of torch's [out, in]); the packed QKV output
dimension is ordered (3, heads, head_dim) flattened outermost-first, matching
flash-attn's ``(three h d)`` packing so converted checkpoints line up.

Layer topology replicates the reference encoder blocks
(/root/reference/seq2gene/modules/layers.py:47-165): pre-LN self-attention with
symmetric ALiBi, pre-LN cross-attention, then a GeGLU FFN whose residual adds
the *original layer input* (``res_long``) — the attention stream reaches the
output only through norm3. This quirk is load-bearing for checkpoint parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from variantformer_tpu.ops import attention as attn_xla

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AttnSpec:
    """Static attention geometry shared by a layer stack."""

    num_heads: int
    head_dim: int
    impl: str = "xla"

    @property
    def scale(self) -> float:
        return self.head_dim ** -0.5


def linear(p: Params, x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    out = jnp.dot(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        preferred_element_type=compute_dtype,
    )
    return out + p["b"].astype(compute_dtype)


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(dtype)


def geglu_ffn(p: Params, x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """GeGLU: split the first projection into value/gate halves; value * gelu(gate)."""
    h = linear(p["ffn_in"], x, compute_dtype)
    value, gate = jnp.split(h, 2, axis=-1)
    h = value * jax.nn.gelu(gate, approximate=False)
    return linear(p["ffn_out"], h, compute_dtype)


def split_packed_heads(x: jax.Array, num: int, heads: int, head_dim: int):
    """[..., heads*num*head_dim] -> ``num`` arrays of [..., heads, head_dim].

    Packed projections are stored head-major (H, num, D): contiguous chunks of
    the flat output dim are whole heads, so sharding that dim across a mesh
    axis is head-parallel tensor parallelism with no resharding at the
    reshape (see models/convert._packed_lin).
    """
    x = x.reshape(*x.shape[:-1], heads, num, head_dim)
    return tuple(x[..., i, :] for i in range(num))


def self_attention_block(
    p: Params,
    x: jax.Array,             # [B, S, E]
    kv_len: jax.Array | None, # [B] valid (prefix) positions
    slopes: jax.Array | None, # [H] ALiBi slopes or None
    spec: AttnSpec,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    b, s, e = x.shape
    qkv = linear(p["wqkv"], x, compute_dtype)
    q, k, v = split_packed_heads(qkv, 3, spec.num_heads, spec.head_dim)
    out = attn_xla.self_attention(q, k, v, kv_len, slopes, spec.scale)
    out = out.reshape(b, s, e)
    return linear(p["out"], out, compute_dtype)


def cross_attention_block(
    p: Params,
    x: jax.Array,              # [B, Sq, E] queries
    ctx: jax.Array,            # [B, Sk, E] keys/values source
    ctx_len: jax.Array | None, # [B]
    spec: AttnSpec,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    b, sq, e = x.shape
    q = linear(p["wq"], x, compute_dtype)
    q = q.reshape(b, sq, spec.num_heads, spec.head_dim)
    kv = linear(p["wkv"], ctx, compute_dtype)
    k, v = split_packed_heads(kv, 2, spec.num_heads, spec.head_dim)
    out = attn_xla.cross_attention(q, k, v, None, ctx_len, spec.scale)
    out = out.reshape(b, sq, e)
    return linear(p["out"], out, compute_dtype)


def context_encoder_layer(
    p: Params,
    x: jax.Array,              # [B, S, E] main stream
    ctx: jax.Array,            # [B, Sk, E] context stream
    x_len: jax.Array | None,
    ctx_len: jax.Array | None,
    slopes: jax.Array | None,
    spec: AttnSpec,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Self-attn + context cross-attn + GeGLU with the reference residual wiring.

    Mirrors ContextFlashAttentionEncoderLayer
    (/root/reference/seq2gene/modules/layers.py:88-165): the FFN residual adds
    the original ``x`` (res_long), not the post-attention stream.
    """
    res_long = x
    h = self_attention_block(
        p["mixer"], layer_norm(p["norm1"], x), x_len, slopes, spec, compute_dtype
    )
    h = h + x
    h2 = cross_attention_block(
        p["cross"], layer_norm(p["norm2"], h), ctx, ctx_len, spec, compute_dtype
    )
    h2 = h2 + h
    out = geglu_ffn(p, layer_norm(p["norm3"], h2), compute_dtype)
    return out + res_long


def cross_only_encoder_layer(
    p: Params,
    x: jax.Array,
    ctx: jax.Array,
    ctx_len: jax.Array | None,
    spec: AttnSpec,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Cross-attention-only block (ContextFlashCrossAttentionEncoderLayer,
    /root/reference/seq2gene/modules/layers.py:231-325)."""
    res_long = x
    h = cross_attention_block(
        p["cross"], layer_norm(p["norm1"], x), ctx, ctx_len, spec, compute_dtype
    )
    h = h + x
    out = geglu_ffn(p, layer_norm(p["norm2"], h), compute_dtype)
    return out + res_long


def self_only_encoder_layer(
    p: Params,
    x: jax.Array,
    x_len: jax.Array | None,
    slopes: jax.Array | None,
    spec: AttnSpec,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Self-attention-only block (FlashAttentionEncoderLayer,
    /root/reference/seq2gene/modules/layers.py:168-228)."""
    h = self_attention_block(
        p["mixer"], layer_norm(p["norm1"], x), x_len, slopes, spec, compute_dtype
    )
    h = h + x
    out = geglu_ffn(p, layer_norm(p["norm2"], h), compute_dtype)
    return out + x
