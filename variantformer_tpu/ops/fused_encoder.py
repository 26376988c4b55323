"""Fully-fused window encoder: the whole transformer stack in one Pallas call.

The window encoder dominates vcf2exp runtime (~60%), and its structure is
special: attention is strictly within each 200-token window, so every window
is independent through the entire depth. That makes the encoder one kernel:

  * grid = (window-block, layer); the layer dimension is the inner,
    sequential axis — per-layer weights stream through VMEM (pipelined DMA)
    while activations persist in VMEM scratch across layer steps, so
    activations never round-trip HBM between layers,
  * per-block HBM traffic: one read of the embedded tokens, one write of the
    pooled embeddings, plus the weight stream,
  * head slicing is lane-aligned: Q/K/V projections are zero-padded per
    head to 64 lanes (zero columns change nothing in QK^T or PV; 64-offset
    lane slicing is verified on this Mosaic — at the released head_dim 64
    the padding is zero-cost), and the attention output feeds the
    out-projection in padded layout, whose matching rows are zeros.

Implements the plain (use_context=False) layer flavor — the released
tokenizer checkpoints — with the reference residual topology:
out = GeGLU(LN2(attn + x)) + x, followed by masked mean pooling.
GELU uses the tanh approximation (Mosaic has no erf lowering); its error
(~3e-4) is below bf16 activation resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _head_lanes(head_dim: int) -> int:
    """Per-head padded width. 64-offset lane slicing of VMEM values is
    verified on this Mosaic, so head_dim<=64 pads to 64 (no waste at the
    released encoder's head_dim 64 — round 1's 128-lane padding doubled the
    QKV/out projection FLOPs)."""
    if head_dim <= 64:
        return 64
    if head_dim <= 128:
        return 128
    raise NotImplementedError(f"head_dim {head_dim} > 128")


def _kernel(
    tok_len_ref,   # [N] int32 (scalar prefetch)
    x_ref,         # [WB, L, E]
    bias_ref,      # [H, L, L] f32 (ALiBi, or zeros)
    n1s_ref, n1b_ref,          # [1, 1, E]
    wq_ref, wk_ref, wv_ref,    # [1, E, H*128] zero-padded per head
    bq_ref, bk_ref, bv_ref,    # [1, 1, H*128]
    wout_ref, bout_ref,        # [1, H*128, E], [1, 1, E]
    n2s_ref, n2b_ref,          # [1, 1, E]
    wf1_ref, bf1_ref,          # [1, E, F], [1, 1, F]
    wf2_ref, bf2_ref,          # [1, F//2, E], [1, 1, E]
    out_ref,       # [WB, E]
    x_state,       # [WB, L, E] bf16 scratch (persists across layer steps)
    attn_scratch,  # [WB*L, H*128] bf16 scratch
    *,
    num_layers: int,
    num_heads: int,
    window_block: int,
    seq_len: int,
    scale: float,
    head_lanes: int,
):
    wb_idx = pl.program_id(0)
    layer = pl.program_id(1)
    e = x_ref.shape[-1]
    rows = window_block * seq_len

    @pl.when(layer == 0)
    def _load():
        x_state[...] = x_ref[...].astype(jnp.bfloat16)

    def layer_norm(x, s, b):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * s + b).astype(x.dtype)

    def matmul(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)

    x = x_state[...]
    h2 = layer_norm(
        x, n1s_ref[0].astype(jnp.float32), n1b_ref[0].astype(jnp.float32)
    ).reshape(rows, e)
    q_all = (matmul(h2, wq_ref[0]).astype(jnp.bfloat16) + bq_ref[0].astype(jnp.bfloat16))
    k_all = (matmul(h2, wk_ref[0]).astype(jnp.bfloat16) + bk_ref[0].astype(jnp.bfloat16))
    v_all = (matmul(h2, wv_ref[0]).astype(jnp.bfloat16) + bv_ref[0].astype(jnp.bfloat16))

    for w in range(window_block):          # static unrolls: aligned slices only
        r0 = w * seq_len
        for h in range(num_heads):
            c0 = h * head_lanes
            q = q_all[r0 : r0 + seq_len, c0 : c0 + head_lanes]
            k = k_all[r0 : r0 + seq_len, c0 : c0 + head_lanes]
            v = v_all[r0 : r0 + seq_len, c0 : c0 + head_lanes]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                       # [L, L]; zero pad-lanes add nothing
            s = s + bias_ref[h]
            n_valid = tok_len_ref[wb_idx * window_block + w]
            s = jnp.where(col_ids < n_valid, s, MASK_VALUE)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                               # [L, 128]; pad cols stay zero
            attn_scratch[r0 : r0 + seq_len, c0 : c0 + head_lanes] = o.astype(
                jnp.bfloat16
            )

    ao = (
        matmul(attn_scratch[...], wout_ref[0]).astype(jnp.bfloat16)
        + bout_ref[0].astype(jnp.bfloat16)
    ).reshape(window_block, seq_len, e)
    x1 = ao + x                             # attn + src
    g = layer_norm(
        x1, n2s_ref[0].astype(jnp.float32), n2b_ref[0].astype(jnp.float32)
    ).reshape(rows, e)
    f = matmul(g, wf1_ref[0]).astype(jnp.bfloat16) + bf1_ref[0].astype(jnp.bfloat16)
    half = f.shape[-1] // 2
    value, gate = f[:, :half], f[:, half:]
    f = value * jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
        jnp.bfloat16
    )
    f = (
        matmul(f, wf2_ref[0]).astype(jnp.bfloat16) + bf2_ref[0].astype(jnp.bfloat16)
    ).reshape(window_block, seq_len, e)
    x_state[...] = f + x                    # res_long = layer input

    @pl.when(layer == num_layers - 1)
    def _pool():
        xf = x_state[...].astype(jnp.float32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (window_block, seq_len), 1)
        lens = jnp.stack(
            [tok_len_ref[wb_idx * window_block + w] for w in range(window_block)]
        )
        valid = (pos < lens[:, None]).astype(jnp.float32)
        denom = jnp.maximum(lens.astype(jnp.float32), 1.0)[:, None]
        pooled = jnp.sum(xf * valid[:, :, None], axis=1) / denom
        out_ref[...] = pooled.astype(out_ref.dtype)


def _pad_heads(w, b, num_heads, head_dim, lanes):
    """[*, H*D] projection -> [*, H*lanes] with zero lanes after each head."""

    e_in = w.shape[0]
    w = w.reshape(e_in, num_heads, head_dim)
    wp = jnp.zeros((e_in, num_heads, lanes), w.dtype)
    wp = wp.at[:, :, :head_dim].set(w)
    b = b.reshape(num_heads, head_dim)
    bp = jnp.zeros((num_heads, lanes), b.dtype)
    bp = bp.at[:, :head_dim].set(b)
    return wp.reshape(e_in, num_heads * lanes), bp.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "window_block")
)
def fused_window_encoder(
    x_emb: jax.Array,      # [N, L, E] embedded tokens
    tok_len: jax.Array,    # [N] int32
    layers: dict,          # stacked plain-layer params (models/init layout)
    slopes: jax.Array | None,
    scale: float,
    num_heads: int,
    window_block: int = 8,
) -> jax.Array:
    """Returns pooled window embeddings [N, E] (bf16)."""
    n, l, e = x_emb.shape
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)
    num_layers = layers["norm1"]["scale"].shape[0]
    hp = num_heads * lanes

    n_pad = -(-n // window_block) * window_block
    if n_pad != n:
        x_emb = jnp.pad(x_emb, ((0, n_pad - n), (0, 0), (0, 0)))
        tok_len = jnp.pad(tok_len, (0, n_pad - n))

    if slopes is None:
        bias = jnp.zeros((num_heads, l, l), jnp.float32)
    else:
        pos = jnp.arange(l)
        dist = jnp.abs(pos[:, None] - pos[None, :]).astype(jnp.float32)
        bias = -slopes.astype(jnp.float32)[:, None, None] * dist

    cast = lambda a: a.astype(jnp.bfloat16)
    nl = num_layers
    # Head-major packed QKV -> per-slot [E, H*D], then zero-pad to H*128.
    wqkv = layers["mixer"]["wqkv"]["w"].reshape(nl, e, num_heads, 3, head_dim)
    bqkv = layers["mixer"]["wqkv"]["b"].reshape(nl, num_heads, 3, head_dim)

    def slot(i):
        ws, bs = [], []
        for layer_i in range(nl):
            w = wqkv[layer_i, :, :, i, :].reshape(e, num_heads * head_dim)
            b = bqkv[layer_i, :, i, :].reshape(num_heads * head_dim)
            wp, bp = _pad_heads(w, b, num_heads, head_dim, lanes)
            ws.append(wp)
            bs.append(bp)
        return cast(jnp.stack(ws)), cast(jnp.stack(bs))

    wq, bq = slot(0)
    wk, bk = slot(1)
    wv, bv = slot(2)
    # out-projection consumes the padded attention layout: insert zero rows.
    wout = layers["mixer"]["out"]["w"].reshape(nl, num_heads, head_dim, e)
    wout_p = jnp.zeros((nl, num_heads, lanes, e), wout.dtype)
    wout_p = cast(wout_p.at[:, :, :head_dim, :].set(wout).reshape(nl, hp, e))

    weights = [
        layers["norm1"]["scale"], layers["norm1"]["bias"],
        wq, wk, wv, bq, bk, bv,
        wout_p, cast(layers["mixer"]["out"]["b"]),
        layers["norm2"]["scale"], layers["norm2"]["bias"],
        cast(layers["ffn_in"]["w"]), cast(layers["ffn_in"]["b"]),
        cast(layers["ffn_out"]["w"]), cast(layers["ffn_out"]["b"]),
    ]
    weights = [w[:, None, :] if w.ndim == 2 else w for w in weights]

    kernel = functools.partial(
        _kernel,
        num_layers=num_layers,
        num_heads=num_heads,
        window_block=window_block,
        seq_len=l,
        scale=scale,
        head_lanes=lanes,
    )
    w_specs = [
        pl.BlockSpec(
            (1, *w.shape[1:]),
            (lambda wb, layer, *_, nd=w.ndim: (layer,) + (0,) * (nd - 1)),
        )
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // window_block, num_layers),
            in_specs=[
                pl.BlockSpec((window_block, l, e), lambda wb, layer, *_: (wb, 0, 0)),
                pl.BlockSpec(bias.shape, lambda wb, layer, *_: (0, 0, 0)),
                *w_specs,
            ],
            out_specs=pl.BlockSpec((window_block, e), lambda wb, layer, *_: (wb, 0)),
            scratch_shapes=[
                pltpu.VMEM((window_block, l, e), jnp.bfloat16),
                pltpu.VMEM((window_block * l, hp), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, e), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(tok_len.astype(jnp.int32), x_emb, bias, *weights)
    return out[:n]
