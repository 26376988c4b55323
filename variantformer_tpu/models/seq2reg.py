"""Window encoder ("seq2reg"): transformer over 200-token BPE windows.

Functional JAX re-design of the reference Seq2RegPredictor
(/root/reference/seq2reg/model.py:40-302) used frozen, in ``only_embed`` mode,
inside the hierarchical model: each CRE/gene window of up to 200 BPE tokens is
encoded and mean-pooled into one 512-d embedding.

TPU-native notes:
  * The per-window context (cCRE-class embedding) is constant across a
    window's positions, so the reference's cross-attention to it reduces
    exactly to ``out_proj(v_proj(ctx_vec))`` — softmax weights over identical
    keys sum to one. We exploit that identity (verified by a unit test) and
    skip the quadratic cross-attention entirely.
  * Layers run under ``lax.scan`` over stacked parameters: one compiled layer
    body regardless of depth.
  * All shapes are static; window validity is a per-window token count
    (suffix padding), which also keeps ALiBi distances exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from variantformer_tpu.config import WindowEncoderConfig
from variantformer_tpu.models import core
from variantformer_tpu.models.core import AttnSpec, Params
from variantformer_tpu.ops.alibi import alibi_slopes


def sinusoidal_position_encoding(d_model: int, length: int) -> np.ndarray:
    """Standard 1d sin/cos table (reference seq2reg/model.py:15-37)."""
    position = np.arange(length, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def _constant_context_bias(
    cross_p: Params, ctx_vec: jax.Array, spec: AttnSpec, compute_dtype
) -> jax.Array:
    """Cross-attention against positionally-constant keys, in closed form.

    With every key/value equal to ``ctx_vec``, softmax weights sum to 1 and the
    attention output is exactly ``out_proj(v_proj(ctx_vec))`` for every query.
    """
    kv = core.linear(cross_p["wkv"], ctx_vec, compute_dtype)  # [B, H*2*D]
    _, v = core.split_packed_heads(kv, 2, spec.num_heads, spec.head_dim)
    v = v.reshape(*v.shape[:-2], spec.num_heads * spec.head_dim)
    return core.linear(cross_p["out"], v, compute_dtype)      # [B, E]


def encode_windows_dual(
    params_a: Params,
    tokens_a: jax.Array,      # [Na, L] int32 BPE ids (suffix-padded)
    tok_len_a: jax.Array,     # [Na] int32
    params_b: Params,
    tokens_b: jax.Array,      # [Nb, L] int32
    tok_len_b: jax.Array,     # [Nb] int32
    cfg: WindowEncoderConfig,
    spec: AttnSpec,
    compute_dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Encode two window sets with different weights (e.g. the CRE and gene
    tokenizers) in ONE fused-encoder call — the grid's window-block index
    selects which stack's weights stream. Requires the fused path
    (spec.impl == "fused", plain layers, mean pooling); callers fall back to
    two encode_windows calls otherwise."""
    from variantformer_tpu.ops.fused_encoder import (
        fused_window_encoder_dual_diff,
    )

    assert not cfg.use_context and cfg.seq_pool == "mean"
    slopes = (
        jnp.asarray(alibi_slopes(cfg.num_heads))
        if cfg.positional_encoding == "alibi" else None
    )
    length = tokens_a.shape[1]
    x_a = params_a["token_embedding"][tokens_a].astype(compute_dtype)
    x_b = params_b["token_embedding"][tokens_b].astype(compute_dtype)
    if cfg.positional_encoding != "alibi":
        pe = jnp.asarray(
            sinusoidal_position_encoding(cfg.embedding_dim, length)
        ).astype(compute_dtype)
        x_a = x_a + pe
        x_b = x_b + pe
    # The *_diff wrapper's primal IS the inference-tuned kernel; under
    # jax.grad it switches to the checkpointing forward + Pallas backward
    # (ops/fused_encoder.py), so this one call serves inference and training.
    out_a, out_b = fused_window_encoder_dual_diff(
        x_a, tok_len_a, params_a["layers"],
        x_b, tok_len_b, params_b["layers"],
        slopes, spec.scale, cfg.num_heads,
    )
    return out_a.astype(compute_dtype), out_b.astype(compute_dtype)


def encode_windows(
    params: Params,
    tokens: jax.Array,        # [N, L] int32 BPE ids (suffix-padded)
    tok_len: jax.Array,       # [N] int32 valid token counts
    context: jax.Array,       # [N] int32 cCRE-class ids (zeros for gene windows)
    cfg: WindowEncoderConfig,
    spec: AttnSpec,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Embed + encode + mean-pool each window. Returns [N, E] (compute dtype)."""
    n, length = tokens.shape
    x = params["token_embedding"][tokens].astype(compute_dtype)  # [N, L, E]

    slopes = None
    if cfg.positional_encoding == "alibi":
        slopes = jnp.asarray(alibi_slopes(cfg.num_heads))
    else:
        pe = jnp.asarray(sinusoidal_position_encoding(cfg.embedding_dim, length))
        x = x + pe.astype(compute_dtype)

    if spec.impl == "fused" and not cfg.use_context:
        # Whole-encoder Pallas kernel: weights VMEM-resident, activations
        # never round-trip HBM between layers (ops/fused_encoder.py). The
        # _diff wrapper's primal is the same kernel; under jax.grad it runs
        # the checkpointing forward + recompute Pallas backward.
        from variantformer_tpu.ops.fused_encoder import (
            fused_window_encoder_diff,
        )

        if cfg.seq_pool != "mean":
            raise NotImplementedError("fused encoder implements mean pooling")
        return fused_window_encoder_diff(
            x, tok_len, params["layers"], slopes, spec.scale, cfg.num_heads
        ).astype(compute_dtype)

    if cfg.use_context:
        ctx_vec = params["context_embedding"][context].astype(compute_dtype)  # [N, E]

        def layer_body(x, layer_p):
            res_long = x
            h = core.self_attention_block(
                layer_p["mixer"], core.layer_norm(layer_p["norm1"], x),
                tok_len, slopes, spec, compute_dtype,
            )
            h = h + x
            ctx_bias = _constant_context_bias(
                layer_p["cross"], ctx_vec, spec, compute_dtype
            )
            h2 = ctx_bias[:, None, :] + h  # cross-attn output + residual
            out = core.geglu_ffn(
                layer_p, core.layer_norm(layer_p["norm3"], h2), compute_dtype
            )
            return out + res_long, None

        # norm2 is applied to h before cross-attn in the reference; but the
        # closed-form context bias does not depend on the queries at all, so
        # norm2(h) never influences the output and is elided here.
    else:
        # Plain FlashTransformerLayer topology (reference seq2reg/modules.py:
        # 129-191): self-attention + GeGLU, both residuals from the input.
        def layer_body(x, layer_p):
            h = core.self_attention_block(
                layer_p["mixer"], core.layer_norm(layer_p["norm1"], x),
                tok_len, slopes, spec, compute_dtype,
            )
            h = h + x
            out = core.geglu_ffn(
                layer_p, core.layer_norm(layer_p["norm2"], h), compute_dtype
            )
            return out + x, None

    x, _ = jax.lax.scan(layer_body, x, params["layers"])

    valid = (jnp.arange(length)[None, :] < tok_len[:, None])  # [N, L]
    if cfg.seq_pool == "mean":
        denom = jnp.maximum(tok_len, 1).astype(jnp.float32)[:, None]
        pooled = jnp.sum(
            x.astype(jnp.float32) * valid[:, :, None], axis=1
        ) / denom
    elif cfg.seq_pool == "max":
        masked = jnp.where(valid[:, :, None], x.astype(jnp.float32), -jnp.inf)
        pooled = jnp.max(masked, axis=1)
    else:
        raise NotImplementedError(f"seq_pool={cfg.seq_pool}")
    return pooled.astype(compute_dtype)


def classify_windows(
    params: Params,
    embeddings: jax.Array,   # [N, E] pooled window embeddings
    tissue_ids: jax.Array,   # [N] int32
) -> jax.Array:
    """Per-tissue linear CRE-class heads (reference seq2reg/model.py:285-301),
    as one gather + batched matmul instead of a python loop over tissues."""
    w = params["tissue_classifiers"]["w"][tissue_ids]  # [N, E, C]
    b = params["tissue_classifiers"]["b"][tissue_ids]  # [N, C]
    return jnp.einsum("ne,nec->nc", embeddings.astype(jnp.float32), w.astype(jnp.float32)) + b
