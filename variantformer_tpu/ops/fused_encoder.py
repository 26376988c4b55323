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
  * the token axis is padded to a 16-row tile multiple (200 -> 208) so the
    per-head attention runs as ONE batched-over-windows dot_general
    ([WB, LP, D] x [WB, LP, D], batch dims at position 0 — the Mosaic
    requirement) instead of a window-by-window unroll: 8 head iterations
    per step instead of WB*H small matmuls, which matters because grid-step
    instruction count, not FLOPs, is the encoder's marginal cost
    (measured on the fused modulator: ~70 us/step of fixed overhead),
  * QKV is one fused [rows, E] @ [E, 3*H*D] projection staged in VMEM
    scratch (SSA values across the head unroll become register spills),
  * window_block=24 (~200 grid steps at production shapes) amortizes both
    the per-step overhead and the per-block weight re-stream; WB=32
    measured 136.5 MB of VMEM (8.5 over budget — the FFN/gelu transients
    scale with WB), WB=24 fits.

Head slicing is lane-aligned: projections are zero-padded per head to 64
lanes (no-op at the released head_dim 64), and the attention output feeds
the out-projection in padded layout, whose matching rows are zeros.

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
    released encoder's head_dim 64)."""
    if head_dim <= 64:
        return 64
    if head_dim <= 128:
        return 128
    raise NotImplementedError(f"head_dim {head_dim} > 128")


def _roundup(n, m):
    return -(-n // m) * m


def _kernel(
    tok_len_ref,   # [N] int32 (scalar prefetch)
    x_ref,         # [WB, LP, E]
    bias_ref,      # [H, LP, LP] f32 (ALiBi, or zeros)
    kbias_ref,     # [WB, LP] f32 streamed key-validity bias (0 / MASK_VALUE)
    n1s_ref, n1b_ref,          # [1, 1, E]
    wqkv_ref, bqkv_ref,        # [1, E, 3*H*lanes], [1, 1, 3*H*lanes]
    wout_ref, bout_ref,        # [1, H*lanes, E], [1, 1, E]
    n2s_ref, n2b_ref,          # [1, 1, E]
    wf1_ref, bf1_ref,          # [1, E, F], [1, 1, F]
    wf2_ref, bf2_ref,          # [1, F//2, E], [1, 1, E]
    out_ref,       # [WB, E]
    x_state,       # [WB, LP, E] bf16 scratch (persists across layer steps)
    qkv_scratch,   # [WB*LP, 3*H*lanes] bf16 scratch
    attn_scratch,  # [WB*LP, H*lanes] bf16 scratch
    *,
    num_layers: int,
    num_heads: int,
    window_block: int,
    seq_len: int,
    scale: float,
    head_lanes: int,
    ffn_chunks: int,
):
    wb_idx = pl.program_id(0)
    layer = pl.program_id(1)
    e = x_ref.shape[-1]
    lp = x_ref.shape[1]
    rows = window_block * lp
    hp = num_heads * head_lanes

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

    x = x_state[...]
    h2 = layer_norm(
        x, n1s_ref[0].astype(jnp.float32), n1b_ref[0].astype(jnp.float32)
    ).reshape(rows, e)
    qkv_scratch[...] = (
        matmul(h2, wqkv_ref[0]).astype(jnp.bfloat16)
        + bqkv_ref[0].astype(jnp.bfloat16)
    )

    for h in range(num_heads):
        c0 = h * head_lanes
        q = qkv_scratch[:, c0 : c0 + head_lanes].reshape(
            window_block, lp, head_lanes
        )
        k = qkv_scratch[:, hp + c0 : hp + c0 + head_lanes].reshape(
            window_block, lp, head_lanes
        )
        v = qkv_scratch[:, 2 * hp + c0 : 2 * hp + c0 + head_lanes].reshape(
            window_block, lp, head_lanes
        )
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                               # [WB, LP, LP]; zero pad-lanes
        # ALiBi (per head) + key-validity (per window, precomputed on the
        # host side of the call: 3D iota/vector-broadcast masks hit Mosaic's
        # unsupported-shape-cast paths at this rank).
        s = s + bias_ref[h][None] + kbias_ref[...][:, None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                       # [WB, LP, lanes]; pads stay 0
        attn_scratch[:, c0 : c0 + head_lanes] = o.reshape(rows, head_lanes).astype(
            jnp.bfloat16
        )

    ao = (
        matmul(attn_scratch[...], wout_ref[0]).astype(jnp.bfloat16)
        + bout_ref[0].astype(jnp.bfloat16)
    ).reshape(window_block, lp, e)
    x1 = ao + x                                 # attn + src
    g = layer_norm(
        x1, n2s_ref[0].astype(jnp.float32), n2b_ref[0].astype(jnp.float32)
    ).reshape(rows, e)
    # The FFN's [rows, F] f32 matmul transient is the VMEM peak that caps
    # window_block; processing whole-window row chunks bounds it at
    # rows/ffn_chunks without changing any math (rows are independent).
    wb_c = window_block // ffn_chunks
    for ci in range(ffn_chunks):
        gblk = g[ci * wb_c * lp : (ci + 1) * wb_c * lp]
        f = (
            matmul(gblk, wf1_ref[0]).astype(jnp.bfloat16)
            + bf1_ref[0].astype(jnp.bfloat16)
        )
        half = f.shape[-1] // 2
        value, gate = f[:, :half], f[:, half:]
        f = value * jax.nn.gelu(
            gate.astype(jnp.float32), approximate=True
        ).astype(jnp.bfloat16)
        f = (
            matmul(f, wf2_ref[0]).astype(jnp.bfloat16)
            + bf2_ref[0].astype(jnp.bfloat16)
        ).reshape(wb_c, lp, e)
        # res_long = layer input
        x_state[ci * wb_c : (ci + 1) * wb_c] = f + x[ci * wb_c : (ci + 1) * wb_c]

    @pl.when(layer == num_layers - 1)
    def _pool():
        xf = x_state[...].astype(jnp.float32)
        lens = jnp.stack(
            [tok_len_ref[wb_idx * window_block + w] for w in range(window_block)]
        )                                                   # [WB]
        pos = jax.lax.broadcasted_iota(jnp.int32, (window_block, lp), 1)
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


def _pack_weights(layers: dict, num_heads: int, head_dim: int, lanes: int):
    """Stacked per-layer params -> the kernel's 12 streamed weight operands,
    each [num_layers, ...] with 2-D params lifted to [L, 1, X]."""
    nl, e = layers["norm1"]["scale"].shape[0], layers["norm1"]["scale"].shape[-1]
    hp = num_heads * lanes
    cast = lambda a: a.astype(jnp.bfloat16)
    # Head-major packed QKV -> [E, 3*H*lanes] (q block | k block | v block),
    # zero-padded per head, consumed by one fused projection.
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

    (wq, bq), (wk, bk), (wv, bv) = slot(0), slot(1), slot(2)
    wqkv_p = jnp.concatenate([wq, wk, wv], axis=-1)         # [L, E, 3*HP]
    bqkv_p = jnp.concatenate([bq, bk, bv], axis=-1)         # [L, 3*HP]
    # out-projection consumes the padded attention layout: insert zero rows.
    wout = layers["mixer"]["out"]["w"].reshape(nl, num_heads, head_dim, e)
    wout_p = jnp.zeros((nl, num_heads, lanes, e), wout.dtype)
    wout_p = cast(wout_p.at[:, :, :head_dim, :].set(wout).reshape(nl, hp, e))

    weights = [
        layers["norm1"]["scale"], layers["norm1"]["bias"],
        wqkv_p, bqkv_p,
        wout_p, cast(layers["mixer"]["out"]["b"]),
        layers["norm2"]["scale"], layers["norm2"]["bias"],
        cast(layers["ffn_in"]["w"]), cast(layers["ffn_in"]["b"]),
        cast(layers["ffn_out"]["w"]), cast(layers["ffn_out"]["b"]),
    ]
    return [w[:, None, :] if w.ndim == 2 else w for w in weights]


def _run_encoder(
    x_emb, tok_len, weights, slopes, scale, num_heads, window_block,
    ffn_chunks, num_layers, weight_block_index,
):
    """Shared pallas_call driver. ``weight_block_index(wb, layer)`` maps a
    grid position to a row of the (possibly multi-stack) weight operands."""
    n_pad, lp, e = x_emb.shape
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)
    hp = num_heads * lanes

    kbias = jnp.where(
        jnp.arange(lp)[None, :] < tok_len[:, None], 0.0, MASK_VALUE
    ).astype(jnp.float32)                                   # [N_pad, LP]

    if slopes is None:
        bias = jnp.zeros((num_heads, lp, lp), jnp.float32)
    else:
        pos = jnp.arange(lp)
        dist = jnp.abs(pos[:, None] - pos[None, :]).astype(jnp.float32)
        bias = -slopes.astype(jnp.float32)[:, None, None] * dist

    if window_block % ffn_chunks:
        raise ValueError("ffn_chunks must divide window_block")
    kernel = functools.partial(
        _kernel,
        num_layers=num_layers,
        num_heads=num_heads,
        window_block=window_block,
        seq_len=lp,
        scale=scale,
        head_lanes=lanes,
        ffn_chunks=ffn_chunks,
    )
    w_specs = [
        pl.BlockSpec(
            (1, *w.shape[1:]),
            (lambda wb, layer, *_, nd=w.ndim:
             (weight_block_index(wb, layer),) + (0,) * (nd - 1)),
        )
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // window_block, num_layers),
            in_specs=[
                pl.BlockSpec((window_block, lp, e), lambda wb, layer, *_: (wb, 0, 0)),
                pl.BlockSpec(bias.shape, lambda wb, layer, *_: (0, 0, 0)),
                pl.BlockSpec((window_block, lp), lambda wb, layer, *_: (wb, 0)),
                *w_specs,
            ],
            out_specs=pl.BlockSpec((window_block, e), lambda wb, layer, *_: (wb, 0)),
            scratch_shapes=[
                pltpu.VMEM((window_block, lp, e), jnp.bfloat16),
                pltpu.VMEM((window_block * lp, 3 * hp), jnp.bfloat16),
                pltpu.VMEM((window_block * lp, hp), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, e), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=127 * 2**20,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(tok_len.astype(jnp.int32), x_emb, bias, kbias, *weights)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "window_block", "ffn_chunks"),
)
def fused_window_encoder(
    x_emb: jax.Array,      # [N, L, E] embedded tokens
    tok_len: jax.Array,    # [N] int32
    layers: dict,          # stacked plain-layer params (models/init layout)
    slopes: jax.Array | None,
    scale: float,
    num_heads: int,
    window_block: int = 24,
    ffn_chunks: int = 1,
) -> jax.Array:
    """Returns pooled window embeddings [N, E] (bf16)."""
    n, l, e = x_emb.shape
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)
    num_layers = layers["norm1"]["scale"].shape[0]

    lp = _roundup(l, 16)
    n_pad = _roundup(n, window_block)
    if n_pad != n or lp != l:
        x_emb = jnp.pad(x_emb, ((0, n_pad - n), (0, lp - l), (0, 0)))
        tok_len = jnp.pad(tok_len, (0, n_pad - n))

    weights = _pack_weights(layers, num_heads, head_dim, lanes)
    out = _run_encoder(
        x_emb, tok_len, weights, slopes, scale, num_heads, window_block,
        ffn_chunks, num_layers, lambda wb, layer: layer,
    )
    return out[:n]


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "window_block", "ffn_chunks"),
)
def fused_window_encoder_dual(
    x_emb_a: jax.Array,    # [Na, L, E] embedded tokens (stack A, e.g. CRE)
    tok_len_a: jax.Array,  # [Na] int32
    layers_a: dict,
    x_emb_b: jax.Array,    # [Nb, L, E] embedded tokens (stack B, e.g. gene)
    tok_len_b: jax.Array,  # [Nb] int32
    layers_b: dict,
    slopes: jax.Array | None,
    scale: float,
    num_heads: int,
    window_block: int = 24,
    ffn_chunks: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Encode two window sets with DIFFERENT weight stacks (same geometry)
    in ONE pallas call: each set pads to a whole number of window blocks and
    the grid's window-block index selects which stack's weights stream
    (A-blocks first, then B-blocks). One kernel launch and one pipeline
    fill/drain instead of two — the window stage is grid-step-bound, so the
    launch/drain overhead is a measurable slice. Returns (pooled_a, pooled_b).
    """
    na, l, e = x_emb_a.shape
    nb = x_emb_b.shape[0]
    assert x_emb_b.shape[1:] == (l, e), "both stacks must share (L, E)"
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)
    num_layers = layers_a["norm1"]["scale"].shape[0]
    assert layers_b["norm1"]["scale"].shape[0] == num_layers

    lp = _roundup(l, 16)
    na_pad = _roundup(na, window_block)
    nb_pad = _roundup(nb, window_block)
    pad = lambda x, npad: jnp.pad(
        x, ((0, npad - x.shape[0]), (0, lp - l), (0, 0))
    )
    x_emb = jnp.concatenate([pad(x_emb_a, na_pad), pad(x_emb_b, nb_pad)])
    tok_len = jnp.concatenate(
        [
            jnp.pad(tok_len_a, (0, na_pad - na)),
            jnp.pad(tok_len_b, (0, nb_pad - nb)),
        ]
    )

    # Packing runs per call as traced ops, which is fine at encoder scale
    # (~40 MB of reshapes/pads, sub-ms) — unlike the 1.2 GB gene-modulator
    # slabs, which MUST pack once at load (ops/fused_modulator.py).
    wa = _pack_weights(layers_a, num_heads, head_dim, lanes)
    wb_ = _pack_weights(layers_b, num_heads, head_dim, lanes)
    weights = [jnp.concatenate([a, b], axis=0) for a, b in zip(wa, wb_)]

    a_blocks = na_pad // window_block
    out = _run_encoder(
        x_emb, tok_len, weights, slopes, scale, num_heads, window_block,
        ffn_chunks, num_layers,
        lambda wb, layer: layer + jnp.where(wb >= a_blocks, num_layers, 0),
    )
    return out[:na], out[na_pad : na_pad + nb]
