"""Hierarchical CRE<->gene model ("seq2gene", combined-modulator semantics).

Functional JAX re-design of the reference Seq2GenePredictorCombinedModulator
(/root/reference/seq2gene/model_combined_modulator.py:36-720). The computation
contract (interleaving, residual wiring, pooling) is preserved exactly:

  gene_0   = gene_layer[0](gene_in,  kv=cre_in)
  cre_i    = cre_layer[i](cre_{i-1}, ctx=class_embedding)          i = 1..24
  gene_i   = gene_layer[i](gene_{i-1}, kv=cre_i)                   i = 1..24
  pooled   = gene_24[:, 0]   (multi-registry token)
  pred     = tissue_head[tissue](pooled)

TPU-native re-structuring (same math, different schedule):
  * The CRE stream never depends on tissue, so CRE layers run once per donor
    at [D, C, E]; only the gene stream fans out to [D, T, G+1, E]. The
    reference replicates everything T times. Keeping the 25 per-donor CRE
    intermediates costs ~40 MB/donor — trivial at donor granularity (the
    memory problem the reference's combined modulator works around only
    exists because of its T-fold replication).
  * Gene layers share their cross-attention K/V projections across the tissue
    axis: K/V are projected per donor and broadcast inside the einsum.
  * Both layer stacks run under lax.scan over stacked parameters.
  * The 63 tissue-expression MLP heads are stacked weights + gather + batched
    einsum over the [D, T] grid (replacing the reference's per-sample Python
    loop, /root/reference/seq2gene/modules/layers.py:1124-1144).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from variantformer_tpu.config import ModelConfig
from variantformer_tpu.models import core
from variantformer_tpu.models.core import AttnSpec, Params
from variantformer_tpu.models.seq2reg import encode_windows
from variantformer_tpu.ops import attention as attn_xla
from variantformer_tpu.ops.alibi import alibi_slopes


class Seq2GeneBatch(NamedTuple):
    """Static-shape device batch. All padding is suffix padding.

    D = donors (or ref/het/hom samples for VEP), C = CRE-window slots,
    G = gene-window slots, L = tokens per window, T = requested tissues.
    """

    cre_tokens: jax.Array       # [D, C, L] int32
    cre_tok_len: jax.Array      # [D, C] int32 valid tokens per window
    cre_count: jax.Array        # [D] int32 valid CRE windows
    cre_labels: jax.Array       # [D, C] int32 cCRE-class ids
    gene_tokens: jax.Array      # [D, G, L] int32
    gene_tok_len: jax.Array     # [D, G] int32
    gene_count: jax.Array       # [D] int32 valid gene windows
    tissue_ids: jax.Array       # [T] int32, shared across donors
    cre_token_position: jax.Array | None = None   # [D] int32 (VEP)
    gene_token_position: jax.Array | None = None  # [D] int32 (VEP)
    # Window-dedup pools (VEP): ref/het/hom donors — and k batched variants
    # on the same gene — share all but a handful of windows, and window
    # encoding is strictly per-window, so encoding each UNIQUE window once
    # and gathering per donor is exact. All five fields set together; the
    # plain window axes above still carry the full per-donor layout (the
    # modulator and counts read them).
    cre_pool_tokens: jax.Array | None = None   # [Uc, L] int32
    cre_pool_len: jax.Array | None = None      # [Uc] int32
    cre_gather: jax.Array | None = None        # [D, C] int32 -> pool row
    gene_pool_tokens: jax.Array | None = None  # [Ug, Lg] int32
    gene_pool_len: jax.Array | None = None     # [Ug] int32
    gene_gather: jax.Array | None = None       # [D, G] int32 -> pool row


class Seq2GeneOutput(NamedTuple):
    pred_expression: jax.Array   # [D, T] f32
    pooled_embedding: jax.Array  # [D, T, E] f32
    gene_token_embedding: jax.Array  # [D, T, E] f32 (zeros unless VEP positions)
    cre_token_embedding: jax.Array   # [D, T, E] f32
    # Final streams (compute dtype), present only with return_streams=True:
    # lets the VEP ref-once cache gather variant-position token embeddings
    # on the host for every later variant on the same (gene, population).
    gene_stream: jax.Array | None = None  # [D, T, G+1, E]
    cre_stream: jax.Array | None = None   # [D, C, E]


def _gene_cross_attention(
    p: Params,
    x: jax.Array,        # [D, T, Sq, E] gene queries
    ctx: jax.Array,      # [D, Sk, E] donor-shared CRE keys/values
    ctx_len: jax.Array,  # [D]
    spec: AttnSpec,
    compute_dtype,
) -> jax.Array:
    """Cross-attention with K/V projected once per donor, shared over T."""
    d, t, sq, e = x.shape
    q = core.linear(p["wq"], x, compute_dtype)
    q = q.reshape(d, t, sq, spec.num_heads, spec.head_dim)
    kv = core.linear(p["wkv"], ctx, compute_dtype)
    kv = kv.reshape(d, ctx.shape[1], spec.num_heads, 2, spec.head_dim)
    k, v = kv[..., 0, :], kv[..., 1, :]
    scores = jnp.einsum(
        "dtqhe,dkhe->dthqk", q, k, preferred_element_type=jnp.float32
    ) * spec.scale
    key_valid = jnp.arange(ctx.shape[1])[None, :] < ctx_len[:, None]  # [D, Sk]
    scores = jnp.where(
        key_valid[:, None, None, None, :], scores, attn_xla.MASK_VALUE
    )
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "dthqk,dkhe->dtqhe", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    out = out.astype(compute_dtype).reshape(d, t, sq, e)
    return core.linear(p["out"], out, compute_dtype)


def _gene_layer(
    p: Params,
    gene: jax.Array,     # [D, T, G1, E]
    cre: jax.Array,      # [D, C, E]
    gene_len: jax.Array, # [D]
    cre_len: jax.Array,  # [D]
    slopes: jax.Array | None,
    only_cross: bool,
    spec: AttnSpec,
    compute_dtype,
) -> jax.Array:
    d, t, g1, e = gene.shape
    res_long = gene
    if only_cross:
        h = gene
    else:
        flat = core.layer_norm(p["norm1"], gene).reshape(d * t, g1, e)
        sa = core.self_attention_block(
            p["mixer"], flat,
            jnp.repeat(gene_len, t), slopes, spec, compute_dtype,
        ).reshape(d, t, g1, e)
        h = sa + gene
    pre_cross_norm = "norm2" if not only_cross else "norm1"
    h2 = _gene_cross_attention(
        p["cross"], core.layer_norm(p[pre_cross_norm], h), cre, cre_len,
        spec, compute_dtype,
    )
    h2 = h2 + h
    post_norm = "norm3" if not only_cross else "norm2"
    out = core.geglu_ffn(p, core.layer_norm(p[post_norm], h2), compute_dtype)
    return out + res_long


def seq2gene_forward(
    params: Params,
    batch: Seq2GeneBatch,
    cfg: ModelConfig,
    impl: str = "xla",
    window_gather_axes: tuple | None = None,
    return_streams: bool = False,
) -> Seq2GeneOutput:
    """End-to-end jittable forward: tokens -> per-(donor, tissue) expression.

    ``window_gather_axes``: set ONLY inside a shard_map body (the fused
    tissue-DP program, parallel/mesh.tissue_dp_forward). The batch's CRE and
    gene WINDOW axes then carry this device's shard; after the window
    encoder runs on the local slice, the embeddings are all-gathered over
    the named axes so the (tissue-sharded) gene stack sees the full window
    set. Window-count fields (cre_count/gene_count/cre_labels/positions)
    must be GLOBAL in that layout.
    """
    mcfg = cfg.seq2gene
    wcfg = cfg.window_encoder
    compute_dtype = jnp.dtype(cfg.precision.compute_dtype)

    # CRE and gene windows may carry different (bucketed) token lengths —
    # CRE windows are short (~30-90 BPE tokens) and pack_samples buckets
    # their token axis separately from the always-full gene chunks.
    d, c, l = batch.cre_tokens.shape
    g, lg = batch.gene_tokens.shape[1:]
    t = batch.tissue_ids.shape[0]
    e = mcfg.emb_dim

    # impl="fused" applies the whole-encoder kernel to the window stage and
    # keeps the modulator on the XLA path; impl="fused2" additionally runs
    # the gene stack through the fused modulator kernel (ops/fused_modulator).
    enc_spec = AttnSpec(
        num_heads=wcfg.num_heads,
        head_dim=wcfg.embedding_dim // wcfg.num_heads,
        impl="fused" if impl == "fused2" else impl,
    )
    mod_spec = AttnSpec(
        num_heads=mcfg.num_heads,
        head_dim=mcfg.emb_dim // mcfg.num_heads,
        impl="xla" if impl in ("fused", "fused2") else impl,
    )
    fused_gene_stack = (
        impl == "fused2"
        and not mcfg.only_cross_attention
        and not mcfg.use_res
        and mod_spec.head_dim <= 64
    )

    # === 1. Window encoding (frozen tokenizers), per donor ===
    if batch.cre_pool_tokens is not None:
        # Window-dedup pools (VEP): encode each unique window once, gather
        # per donor — exact, because window encoding never crosses windows.
        if wcfg.use_context:
            raise ValueError(
                "window-dedup pools require the context-free encoder "
                "(per-window labels are not pooled)"
            )
        lc_p = batch.cre_pool_tokens.shape[-1]
        lg_p = batch.gene_pool_tokens.shape[-1]
        if (
            enc_spec.impl == "fused"
            and wcfg.seq_pool == "mean"
            and lc_p == lg_p
        ):
            from variantformer_tpu.models.seq2reg import encode_windows_dual

            cre_pool, gene_pool = encode_windows_dual(
                params["cre_tokenizer"],
                batch.cre_pool_tokens, batch.cre_pool_len,
                params["gene_tokenizer"],
                batch.gene_pool_tokens, batch.gene_pool_len,
                wcfg, enc_spec, compute_dtype,
            )
        else:
            cre_pool = encode_windows(
                params["cre_tokenizer"],
                batch.cre_pool_tokens, batch.cre_pool_len,
                jnp.zeros((batch.cre_pool_tokens.shape[0],), jnp.int32),
                wcfg, enc_spec, compute_dtype,
            )
            gene_pool = encode_windows(
                params["gene_tokenizer"],
                batch.gene_pool_tokens, batch.gene_pool_len,
                jnp.zeros((batch.gene_pool_tokens.shape[0],), jnp.int32),
                wcfg, enc_spec, compute_dtype,
            )
        cre_emb = cre_pool[batch.cre_gather]    # [D, C, E1]
        gene_emb = gene_pool[batch.gene_gather]  # [D, G, E1]
    elif (
        enc_spec.impl == "fused"
        and not wcfg.use_context
        and wcfg.seq_pool == "mean"
        and l == lg
    ):
        # One fused-encoder launch for BOTH window sets: the grid's
        # window-block index selects which tokenizer's weights stream
        # (ops/fused_encoder.fused_window_encoder_dual) — one pipeline
        # fill/drain instead of two.
        from variantformer_tpu.models.seq2reg import encode_windows_dual

        cre_emb, gene_emb = encode_windows_dual(
            params["cre_tokenizer"],
            batch.cre_tokens.reshape(d * c, l),
            batch.cre_tok_len.reshape(d * c),
            params["gene_tokenizer"],
            batch.gene_tokens.reshape(d * g, lg),
            batch.gene_tok_len.reshape(d * g),
            wcfg, enc_spec, compute_dtype,
        )
        cre_emb = cre_emb.reshape(d, c, -1)
        gene_emb = gene_emb.reshape(d, g, -1)
    else:
        cre_emb = encode_windows(
            params["cre_tokenizer"],
            batch.cre_tokens.reshape(d * c, l),
            batch.cre_tok_len.reshape(d * c),
            batch.cre_labels.reshape(d * c),
            wcfg, enc_spec, compute_dtype,
        ).reshape(d, c, -1)
        gene_emb = encode_windows(
            params["gene_tokenizer"],
            batch.gene_tokens.reshape(d * g, lg),
            batch.gene_tok_len.reshape(d * g),
            jnp.zeros((d * g,), jnp.int32),
            wcfg, enc_spec, compute_dtype,
        ).reshape(d, g, -1)

    if window_gather_axes is not None:
        # Fused tissue-DP: each device encoded a window shard; rebuild the
        # full window axes (tiny collective: ~3.6 MB at full geometry).
        # Only the dual fused-encoder path is window-shard-safe: the plain
        # path feeds per-window cre_labels into the encoder, and labels stay
        # GLOBAL in this layout.
        if not (
            enc_spec.impl == "fused"
            and not wcfg.use_context
            and wcfg.seq_pool == "mean"
            and l == lg
        ):
            raise ValueError(
                "window_gather_axes requires the dual fused encoder path "
                "(impl='fused'/'fused2', no context, mean pool, equal "
                "token lengths)"
            )
        cre_emb = jax.lax.all_gather(
            cre_emb, window_gather_axes, axis=1, tiled=True
        )
        gene_emb = jax.lax.all_gather(
            gene_emb, window_gather_axes, axis=1, tiled=True
        )
        c = cre_emb.shape[1]
        g = gene_emb.shape[1]

    # === 2. Map to modulator width ===
    cre = core.linear(params["cre_map"], cre_emb, compute_dtype)    # [D, C, E]
    gene = core.linear(params["gene_map"], gene_emb, compute_dtype) # [D, G, E]

    # === 3. Registry token fan-out over tissues ===
    registry = params["registry"][batch.tissue_ids].astype(compute_dtype)  # [T, E]
    gene_stream = jnp.concatenate(
        [
            jnp.broadcast_to(registry[None, :, None, :], (d, t, 1, e)),
            jnp.broadcast_to(gene[:, None, :, :], (d, t, g, e)),
        ],
        axis=2,
    )  # [D, T, G+1, E]
    gene_len = batch.gene_count + 1  # registry token is always valid

    slopes = jnp.asarray(alibi_slopes(mcfg.num_heads)) if mcfg.use_alibi else None

    # === 4. CRE stack once per donor, keeping all 25 gene-layer inputs ===
    ctx_embedding = params["context_embedding"][batch.cre_labels].astype(
        compute_dtype
    )  # [D, C, E]

    def cre_body(x, layer_p):
        out = core.context_encoder_layer(
            layer_p, x, ctx_embedding, batch.cre_count, batch.cre_count,
            slopes, mod_spec, compute_dtype,
        )
        return out, out

    if mcfg.remat:
        cre_body = jax.checkpoint(cre_body)
    cre_final, cre_steps = jax.lax.scan(cre_body, cre, params["cre_layers"])
    # Gene layer i consumes CRE intermediate i (input CRE for i=0).
    cre_intermediates = jnp.concatenate([cre[None], cre_steps], axis=0)  # [25, D, C, E]

    # === 5. Gene stack scanning over (gene layer, CRE intermediate) pairs ===
    if fused_gene_stack:
        from variantformer_tpu.ops.fused_modulator import (
            fused_gene_modulator_diff,
            fused_gene_modulator_packed,
            pick_tissue_block,
        )

        import os

        # Perf-tuning overrides (trace-time; used by scripts/*_probe.py to
        # A/B block plans inside the FULL model, where XLA scheduling around
        # the kernel differs from standalone kernel timing). Defaults from
        # the full-model d=4 A/B on v5e: per-donor chunked calls at TB=6
        # (584 ms, 59.4% MFU) beat the donor-folded grid (4x4: 626 ms,
        # 3x4: 643 ms) — chunked calls let XLA overlap the next donor's
        # ckv/glue with the current donor's kernel, outweighing the fold's
        # standalone win (110.8 vs 120.7 ms/donor of weight-DMA saving).
        db_pick = int(os.environ.get("VFX_MOD_DB", "0")) or 1
        tb_pick = int(os.environ.get("VFX_MOD_TB", "0")) or pick_tissue_block(
            t, db_pick
        )
        packed = params.get("gene_layers_packed")
        if packed is not None:
            # Inference fast path: load-time packed weights
            # (VCFProcessor.set_params). One kernel for the whole donor
            # batch (donor axis rides the grid: weights stream once per
            # tissue-block sweep for ALL donors).
            ffn = params["gene_layers"]["ffn_in"]["w"].shape[-1]
            gene_stream = fused_gene_modulator_packed(
                gene_stream, cre_intermediates,
                gene_len, batch.cre_count,
                packed, slopes, ffn, mod_spec.scale,
                mod_spec.num_heads, mod_spec.head_dim,
                tissue_block=tb_pick, donor_block=db_pick,
            ).astype(compute_dtype)
        else:
            # Differentiable path (packs inline): the primal is the same
            # inference-tuned kernel; under jax.grad the forward checkpoints
            # per-layer x/h streams and the recompute Pallas backward
            # produces gene-stream/CRE/weight grads (ops/fused_modulator).
            gene_stream = fused_gene_modulator_diff(
                gene_stream, cre_intermediates,
                gene_len, batch.cre_count,
                params["gene_layers"], slopes, mod_spec.scale,
                mod_spec.num_heads, mod_spec.head_dim,
                tb_pick,
            ).astype(compute_dtype)
    else:
        gene_res = gene_stream if mcfg.use_res else None

        def gene_body(gs, inputs):
            layer_p, cre_kv = inputs
            out = _gene_layer(
                layer_p, gs, cre_kv, gene_len, batch.cre_count,
                slopes, mcfg.only_cross_attention, mod_spec, compute_dtype,
            )
            if gene_res is not None:
                out = out + gene_res
            return out, None

        if mcfg.remat:
            gene_body = jax.checkpoint(gene_body)
        gene_stream, _ = jax.lax.scan(
            gene_body, gene_stream, (params["gene_layers"], cre_intermediates)
        )

    # === 6. Pool + tissue heads ===
    pooled = gene_stream[:, :, 0, :]  # [D, T, E] multi-registry pooling
    pred = tissue_expression_heads(
        params["tissue_heads"], pooled, batch.tissue_ids, cfg, compute_dtype
    )

    # === 7. VEP token-position gathers ===
    if batch.gene_token_position is not None:
        # Registry token shifts gene positions by one
        # (reference model_combined_modulator.py:664-666).
        pos = (batch.gene_token_position + 1).astype(jnp.int32)
        gene_tok = jnp.take_along_axis(
            gene_stream, pos[:, None, None, None], axis=2
        )[:, :, 0, :]
    else:
        gene_tok = jnp.zeros((d, t, e), compute_dtype)
    if batch.cre_token_position is not None:
        cpos = batch.cre_token_position.astype(jnp.int32)
        cre_tok = jnp.take_along_axis(cre_final, cpos[:, None, None], axis=1)
        cre_tok = jnp.broadcast_to(cre_tok, (d, t, e))
    else:
        cre_tok = jnp.zeros((d, t, e), compute_dtype)

    return Seq2GeneOutput(
        pred_expression=pred.astype(jnp.float32),
        pooled_embedding=pooled.astype(jnp.float32),
        gene_token_embedding=gene_tok.astype(jnp.float32),
        cre_token_embedding=cre_tok.astype(jnp.float32),
        # compute_dtype, not a forced narrow cast: the host-side ref-once
        # gathers must reproduce the in-model gather+f32-cast exactly.
        gene_stream=(
            gene_stream.astype(compute_dtype) if return_streams else None
        ),
        cre_stream=(
            cre_final.astype(compute_dtype) if return_streams else None
        ),
    )


def tissue_expression_heads(
    p: Params,
    pooled: jax.Array,     # [D, T, E]
    tissue_ids: jax.Array, # [T]
    cfg: ModelConfig,
    compute_dtype,
) -> jax.Array:
    """Per-tissue expression MLP (bigger-head variant), batched over [D, T].

    Head structure (reference seq2gene/modules/layers.py:1060-1076):
    Linear(E,E) -> LayerNorm -> GELU -> Linear(E,E) -> GELU -> Linear(E,1)
    -> Softplus (poisson loss head).
    """
    mcfg = cfg.seq2gene
    if not mcfg.use_bigger_head or mcfg.head_type != "mlp":
        raise NotImplementedError("only the released bigger-head MLP is wired up")
    x = pooled.astype(compute_dtype)
    # multi_head=False (released config): one shared head — the stacked-head
    # tree has a single entry every tissue gathers
    # (reference seq2gene/modules/layers.py:1077-1086,1134-1139).
    tissue_ids = tissue_ids if mcfg.multi_head else jnp.zeros_like(tissue_ids)
    w1 = p["w1"][tissue_ids].astype(compute_dtype)   # [T, E, E]
    b1 = p["b1"][tissue_ids].astype(compute_dtype)   # [T, E]
    h = jnp.einsum("dte,tei->dti", x, w1, preferred_element_type=compute_dtype) + b1
    ln = {
        "scale": p["ln_scale"][tissue_ids],
        "bias": p["ln_bias"][tissue_ids],
    }
    h = core.layer_norm(ln, h)
    h = jax.nn.gelu(h, approximate=False)
    w2 = p["w2"][tissue_ids].astype(compute_dtype)
    b2 = p["b2"][tissue_ids].astype(compute_dtype)
    h = jnp.einsum("dte,tei->dti", h, w2, preferred_element_type=compute_dtype) + b2
    h = jax.nn.gelu(h, approximate=False)
    w3 = p["w3"][tissue_ids].astype(compute_dtype)   # [T, E, 1]
    b3 = p["b3"][tissue_ids].astype(compute_dtype)   # [T, 1]
    out = jnp.einsum("dte,teo->dto", h, w3, preferred_element_type=jnp.float32)
    out = out + b3.astype(jnp.float32)
    return jax.nn.softplus(out[..., 0])
