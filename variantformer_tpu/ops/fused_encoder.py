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
  * window_block=32 with ffn_chunks=2 (~150 grid steps at production
    shapes) amortizes both the per-step overhead and the per-block weight
    re-stream. WB=32 at chunks=1 measured 136.5 MB of VMEM (8.5 over
    budget — the FFN/gelu transients scale with WB); chunking the FFN rows
    brings it back under, and the on-chip sweep (encoder_wb_probe, round 3)
    measured 171.4 ms vs WB=24's 195.5 for the d=4 window set (-12%);
    WB=40:5 ties (172.4), WB=48:6 fails to compile.

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
import numpy as np
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
    *rest,         # optional xsave_ref [1, WB, LP, E], then the 3 scratches
    num_layers: int,
    num_heads: int,
    window_block: int,
    seq_len: int,
    scale: float,
    head_lanes: int,
    ffn_chunks: int,
    save_inputs: bool = False,
):
    if save_inputs:
        xsave_ref, x_state, qkv_scratch, attn_scratch = rest
    else:
        (x_state, qkv_scratch, attn_scratch) = rest
        xsave_ref = None
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
    if save_inputs:
        # Per-layer inputs checkpoint to HBM for the backward pass
        # (recompute-from-layer-input VJP, see _bwd_kernel).
        xsave_ref[0] = x
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


def _masks(tok_len, lp, slopes, num_heads):
    kbias = jnp.where(
        jnp.arange(lp)[None, :] < tok_len[:, None], 0.0, MASK_VALUE
    ).astype(jnp.float32)                                   # [N_pad, LP]
    if slopes is None:
        bias = jnp.zeros((num_heads, lp, lp), jnp.float32)
    else:
        pos = jnp.arange(lp)
        dist = jnp.abs(pos[:, None] - pos[None, :]).astype(jnp.float32)
        bias = -slopes.astype(jnp.float32)[:, None, None] * dist
    return bias, kbias


def _run_encoder(
    x_emb, tok_len, weights, slopes, scale, num_heads, window_block,
    ffn_chunks, num_layers, weight_block_index, save_inputs=False,
):
    """Shared pallas_call driver. ``weight_block_index(wb, layer)`` maps a
    grid position to a row of the (possibly multi-stack) weight operands.
    ``save_inputs=True`` additionally emits every layer's input block to HBM
    ([num_layers, N_pad, LP, E] bf16) for the recompute backward."""
    n_pad, lp, e = x_emb.shape
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)
    hp = num_heads * lanes

    bias, kbias = _masks(tok_len, lp, slopes, num_heads)

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
        save_inputs=save_inputs,
    )
    w_specs = [
        pl.BlockSpec(
            (1, *w.shape[1:]),
            (lambda wb, layer, *_, nd=w.ndim:
             (weight_block_index(wb, layer),) + (0,) * (nd - 1)),
        )
        for w in weights
    ]
    out_specs = pl.BlockSpec((window_block, e), lambda wb, layer, *_: (wb, 0))
    out_shape = jax.ShapeDtypeStruct((n_pad, e), jnp.bfloat16)
    if save_inputs:
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (1, window_block, lp, e), lambda wb, layer, *_: (layer, wb, 0, 0)
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((num_layers, n_pad, lp, e), jnp.bfloat16),
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
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((window_block, lp, e), jnp.bfloat16),
                pltpu.VMEM((window_block * lp, 3 * hp), jnp.bfloat16),
                pltpu.VMEM((window_block * lp, hp), jnp.bfloat16),
            ],
        ),
        out_shape=out_shape,
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
    window_block: int = 32,
    ffn_chunks: int = 2,
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
    window_block: int = 32,
    ffn_chunks: int = 2,
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


# ---------------------------------------------------------------------------
# Backward: custom VJP for the fused window encoder
# ---------------------------------------------------------------------------
#
# Counterpart capability: flash-attn's backward kernels, which the
# reference's training era relied on (/root/reference/seq2gene/modules/
# layers.py:6-10). Design (TPU-native, no reference analogue):
#
#   * The forward (save_inputs=True) checkpoints every layer's INPUT block to
#     HBM — the minimal residual set; everything else is recomputed in-kernel.
#   * The backward runs ONE pallas_call per layer, in reverse layer order
#     (see _run_layer_bwd): each call's grid sweeps the window blocks for
#     that layer, with the layer's weight-gradient accumulators living in
#     revisited output VMEM blocks across the sweep (init at the sweep's
#     first block, += after) and flushed once at the end. The dx chain is a
#     plain array threaded between consecutive pallas_calls — no buffer
#     aliasing is relied upon. (A fused (layer_reversed, window_block) grid
#     with dx riding an input/output-aliased HBM buffer was considered and
#     rejected: interpreter mode does not honor cross-sweep aliasing, so the
#     fused grid could not be CI-tested on the CPU mesh.)
#   * Pooling backward seeds dx before the l = L-1 call.
#
# Gradient zero-flow invariants (checked in tests): pad windows (tok_len 0)
# and pad token rows receive exactly zero gradient — masked keys give p=0,
# so dk/dv at pad positions vanish, and all other ops are row-local.


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _gelu_tanh_grad(x):
    c = 0.7978845608028654  # sqrt(2/pi)
    u = c * (x + 0.044715 * x * x * x)
    t = jnp.tanh(u)
    du = c * (1.0 + 3 * 0.044715 * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _ln_fwd_vals(x, s, b):
    """float32 LN forward returning (y_f32, xhat, rstd)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = xc * rstd
    return xhat * s + b, xhat, rstd


def _ln_bwd(dy, xhat, rstd, s):
    """Row-local LN backward. Returns (dx_f32, dscale_vec, dbias_vec)."""
    dyf = dy.astype(jnp.float32)
    dxhat = dyf * s
    m1 = jnp.mean(dxhat, -1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, -1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    red = tuple(range(dy.ndim - 1))
    return dx, jnp.sum(dyf * xhat, axis=red), jnp.sum(dyf, axis=red)


def _bwd_kernel(
    tok_len_ref,   # [N] int32 (scalar prefetch; unused, kept for spec parity)
    xsave_ref,     # [1, WB, LP, E] bf16 — this layer's INPUT
    bias_ref,      # [H, LP, LP] f32
    kbias_ref,     # [WB, LP] f32
    dnext_ref,     # [WB, LP, E] bf16 — cotangent of this layer's OUTPUT
    n1s_ref, n1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    n2s_ref, n2b_ref, wf1_ref, bf1_ref, wf2_ref, bf2_ref,
    # outputs
    dx_out_ref,    # [WB, LP, E] bf16 — cotangent of this layer's INPUT
    dn1s_ref, dn1b_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
    dn2s_ref, dn2b_ref, dwf1_ref, dbf1_ref, dwf2_ref, dbf2_ref,  # f32
    # scratch
    qkv_scratch,   # [WB*LP, 3*H*lanes] bf16
    attn_scratch,  # [WB*LP, H*lanes] bf16
    dattn_scratch, # [WB*LP, H*lanes] bf16
    dqkv_scratch,  # [WB*LP, 3*H*lanes] bf16
    *,
    num_heads: int,
    window_block: int,
    scale: float,
    head_lanes: int,
    ffn_chunks: int,
    dw_init_pred,
):
    """One layer's backward over one window block, recomputing the forward
    internals from the checkpointed layer input (see the design note above
    fused_window_encoder_diff). Weight-gradient outputs have a constant
    block index, so they accumulate in VMEM across the window sweep (init at
    the sweep's first block per ``dw_init_pred``)."""
    wb_idx = pl.program_id(0)
    lp = xsave_ref.shape[2]
    e = xsave_ref.shape[3]
    rows = window_block * lp
    hp = num_heads * head_lanes
    f32 = jnp.float32

    x = xsave_ref[0]                                        # [WB, LP, E] bf16
    s1 = n1s_ref[0].astype(f32)
    b1 = n1b_ref[0].astype(f32)
    s2 = n2s_ref[0].astype(f32)
    b2 = n2b_ref[0].astype(f32)

    def matmul(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    def matmul_t(a, w):
        """a [R, K] x w [C, K] -> [R, C] (contract both dim 1)."""
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )

    def matmul_rows(a, b):
        """a [R, K] x b [R, C] -> [K, C] (contract the row axis)."""
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )

    # ---- recompute forward internals from the layer input -----------------
    h2_f, xhat1, rstd1 = _ln_fwd_vals(x, s1, b1)
    h2 = h2_f.astype(jnp.bfloat16).reshape(rows, e)
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
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        ) * scale
        s = s + bias_ref[h][None] + kbias_ref[...][:, None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        attn_scratch[:, c0 : c0 + head_lanes] = o.reshape(
            rows, head_lanes
        ).astype(jnp.bfloat16)

    ao = (
        matmul(attn_scratch[...], wout_ref[0]).astype(jnp.bfloat16)
        + bout_ref[0].astype(jnp.bfloat16)
    ).reshape(window_block, lp, e)
    x1 = ao + x
    g_f, xhat2, rstd2 = _ln_fwd_vals(x1, s2, b2)
    g = g_f.astype(jnp.bfloat16).reshape(rows, e)

    dnext = dnext_ref[...]                                   # [WB, LP, E] bf16

    # ---- FFN / LN2 / out-projection backward (row chunks) ------------------
    # x_next = GeGLU(LN2(ao + x)) + x  (res_long), so:
    #   d ffn_out = dnext;  dx += dnext;  ffn bwd -> dg;  LN2 bwd -> dx1;
    #   dx += dx1;  dao = dx1 -> out-proj bwd -> dattn.
    wb_c = window_block // ffn_chunks
    half = wf2_ref.shape[1]
    dn2s_acc = jnp.zeros((e,), f32)
    dn2b_acc = jnp.zeros((e,), f32)
    dwf1_acc = jnp.zeros((e, 2 * half), f32)
    dbf1_acc = jnp.zeros((2 * half,), f32)
    dwf2_acc = jnp.zeros((half, e), f32)
    dbf2_acc = jnp.zeros((e,), f32)
    dwout_acc = jnp.zeros((hp, e), f32)
    dbout_acc = jnp.zeros((e,), f32)
    dx1_full = []
    for ci in range(ffn_chunks):
        r0, r1 = ci * wb_c * lp, (ci + 1) * wb_c * lp
        gc = g[r0:r1]
        fc = (
            matmul(gc, wf1_ref[0]).astype(jnp.bfloat16)
            + bf1_ref[0].astype(jnp.bfloat16)
        )
        value, gate = fc[:, :half], fc[:, half:]
        gate_f = gate.astype(f32)
        gelu_g = _gelu_tanh(gate_f)
        dy_c = dnext[ci * wb_c : (ci + 1) * wb_c].reshape(wb_c * lp, e)
        # ffn_out backward
        hmid = (value.astype(f32) * gelu_g).astype(jnp.bfloat16)
        dwf2_acc += matmul_rows(hmid, dy_c)
        dbf2_acc += jnp.sum(dy_c.astype(f32), axis=0)
        dh = matmul_t(dy_c, wf2_ref[0])                       # [rc, half] f32
        # GeGLU backward
        dvalue = dh * gelu_g
        dgate = dh * value.astype(f32) * _gelu_tanh_grad(gate_f)
        df = jnp.concatenate(
            [dvalue, dgate], axis=-1
        ).astype(jnp.bfloat16)                                # [rc, F]
        dwf1_acc += matmul_rows(gc, df)
        dbf1_acc += jnp.sum(df.astype(f32), axis=0)
        dg_c = matmul_t(df, wf1_ref[0])                       # [rc, E] f32
        # LN2 backward (row-local)
        dx1_c, dsc2, dbc2 = _ln_bwd(
            dg_c.reshape(wb_c, lp, e),
            xhat2[ci * wb_c : (ci + 1) * wb_c],
            rstd2[ci * wb_c : (ci + 1) * wb_c],
            s2,
        )
        dn2s_acc += dsc2
        dn2b_acc += dbc2
        dao_c = dx1_c.reshape(wb_c * lp, e).astype(jnp.bfloat16)
        # out-projection backward
        dwout_acc += matmul_rows(attn_scratch[r0:r1], dao_c)
        dbout_acc += jnp.sum(dao_c.astype(f32), axis=0)
        dattn_scratch[r0:r1] = matmul_t(dao_c, wout_ref[0]).astype(jnp.bfloat16)
        dx1_full.append(dx1_c)
    dx1 = jnp.concatenate(dx1_full, axis=0)                   # [WB, LP, E] f32

    # ---- attention backward (per head, recomputing p) -----------------------
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
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        ) * scale
        s = s + bias_ref[h][None] + kbias_ref[...][:, None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)            # [WB, LP, LP] f32
        do = dattn_scratch[:, c0 : c0 + head_lanes].reshape(
            window_block, lp, head_lanes
        )
        p_b = p.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(
            p_b, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )                                                     # [WB, LPk, lanes]
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )                                                     # [WB, LPq, LPk]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_b = (ds * scale).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(
            ds_b, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        dk = jax.lax.dot_general(
            ds_b, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        dqkv_scratch[:, c0 : c0 + head_lanes] = dq.reshape(
            rows, head_lanes
        ).astype(jnp.bfloat16)
        dqkv_scratch[:, hp + c0 : hp + c0 + head_lanes] = dk.reshape(
            rows, head_lanes
        ).astype(jnp.bfloat16)
        dqkv_scratch[:, 2 * hp + c0 : 2 * hp + c0 + head_lanes] = dv.reshape(
            rows, head_lanes
        ).astype(jnp.bfloat16)

    # ---- QKV projection + LN1 backward --------------------------------------
    dqkv = dqkv_scratch[...]
    dwqkv_c = matmul_rows(h2, dqkv)                           # [E, 3HP]
    dbqkv_c = jnp.sum(dqkv.astype(f32), axis=0)
    dh2 = matmul_t(dqkv, wqkv_ref[0]).reshape(window_block, lp, e)
    dx_attn, dsc1, dbc1 = _ln_bwd(dh2, xhat1, rstd1, s1)

    dx_total = dnext.astype(f32) + dx1 + dx_attn
    dx_out_ref[...] = dx_total.astype(jnp.bfloat16)

    # ---- weight-gradient accumulation across the window sweep ---------------
    contribs = (
        (dn1s_ref, dsc1[None, None, :]),
        (dn1b_ref, dbc1[None, None, :]),
        (dwqkv_ref, dwqkv_c[None]),
        (dbqkv_ref, dbqkv_c[None, None, :]),
        (dwout_ref, dwout_acc[None]),
        (dbout_ref, dbout_acc[None, None, :]),
        (dn2s_ref, dn2s_acc[None, None, :]),
        (dn2b_ref, dn2b_acc[None, None, :]),
        (dwf1_ref, dwf1_acc[None]),
        (dbf1_ref, dbf1_acc[None, None, :]),
        (dwf2_ref, dwf2_acc[None]),
        (dbf2_ref, dbf2_acc[None, None, :]),
    )
    init = dw_init_pred(wb_idx)

    @pl.when(init)
    def _init():
        for ref, val in contribs:
            ref[...] = val

    @pl.when(jnp.logical_not(init))
    def _accum():
        for ref, val in contribs:
            ref[...] += val


def _run_layer_bwd(
    xsave, tok_len, dnext, weights, bias, kbias, scale, num_heads,
    window_block, ffn_chunks, layer_index, weight_block_index, dw_init_pred,
    n_dw_slots=1,
):
    """One layer's backward as its own pallas_call over the window sweep.

    The layer axis runs as an XLA-level loop in ``_diff_bwd`` (one call per
    layer, dx chained as a plain array between calls) rather than as a grid
    axis: chaining dx through an input/output-aliased HBM buffer inside a
    single (layer, window) grid is not honored by Pallas interpreter mode,
    which would leave the CPU-mesh CI blind to the kernel's correctness.
    The cost is num_layers pipeline fills; the win — weights and dW
    accumulators stay VMEM-resident across the whole window sweep, and the
    only HBM activation traffic is one read of the checkpointed layer input
    and one read+write of dx per layer — is preserved.

    Returns (dx [N_pad, LP, E] bf16, [per-slot packed dW f32]); dW outputs
    are [n_dw_slots, ...] (one slot per weight stack; the block index is
    ``weight_block_index(wb, layer_index)[0]`` mapped to slot via //).
    """
    _, n_pad, lp, e = xsave.shape
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)
    hp = num_heads * lanes
    num_layers = weights[0].shape[0] // n_dw_slots

    kernel = functools.partial(
        _bwd_kernel,
        num_heads=num_heads,
        window_block=window_block,
        scale=scale,
        head_lanes=lanes,
        ffn_chunks=ffn_chunks,
        dw_init_pred=dw_init_pred,
    )
    w_specs = [
        pl.BlockSpec(
            (1, *w.shape[1:]),
            (lambda wb, *_, nd=w.ndim:
             (weight_block_index(wb, layer_index),) + (0,) * (nd - 1)),
        )
        for w in weights
    ]
    dw_specs = [
        pl.BlockSpec(
            (1, *w.shape[1:]),
            (lambda wb, *_, nd=w.ndim:
             (weight_block_index(wb, layer_index) // num_layers,)
             + (0,) * (nd - 1)),
        )
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // window_block,),
            in_specs=[
                pl.BlockSpec(
                    (1, window_block, lp, e),
                    lambda wb, *_, li=layer_index: (li, wb, 0, 0),
                ),
                pl.BlockSpec(bias.shape, lambda wb, *_: (0, 0, 0)),
                pl.BlockSpec((window_block, lp), lambda wb, *_: (wb, 0)),
                pl.BlockSpec((window_block, lp, e), lambda wb, *_: (wb, 0, 0)),
                *w_specs,
            ],
            out_specs=[
                pl.BlockSpec((window_block, lp, e), lambda wb, *_: (wb, 0, 0)),
                *dw_specs,
            ],
            scratch_shapes=[
                pltpu.VMEM((window_block * lp, 3 * hp), jnp.bfloat16),
                pltpu.VMEM((window_block * lp, hp), jnp.bfloat16),
                pltpu.VMEM((window_block * lp, hp), jnp.bfloat16),
                pltpu.VMEM((window_block * lp, 3 * hp), jnp.bfloat16),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, lp, e), jnp.bfloat16),
            *[
                jax.ShapeDtypeStruct((n_dw_slots, *w.shape[1:]), jnp.float32)
                for w in weights
            ],
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2**20,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(tok_len.astype(jnp.int32), xsave, bias, kbias, dnext, *weights)
    return out[0], out[1:]


def _unpack_weight_grads(dws, layers, num_heads, head_dim, lanes):
    """Inverse of _pack_weights: packed-layout f32 grads -> the stacked
    per-layer params structure (pad lanes/rows carry exact zeros)."""
    nl = layers["norm1"]["scale"].shape[0]
    e = layers["norm1"]["scale"].shape[-1]
    (dn1s, dn1b, dwqkv_p, dbqkv_p, dwout_p, dbout, dn2s, dn2b,
     dwf1, dbf1, dwf2, dbf2) = dws

    def unlift(a, template):
        # [L, 1, X] -> [L, X] when the original param was 2-D
        return a.reshape(template.shape) if template.ndim == 2 else a

    hp = num_heads * lanes
    # wqkv: packed [L, E, 3*HP] = q|k|v blocks, each head padded to lanes.
    slots = []
    bslots = []
    for si in range(3):
        w = dwqkv_p[:, :, si * hp : (si + 1) * hp].reshape(
            nl, e, num_heads, lanes
        )[..., :head_dim]                                     # [L, E, H, D]
        b = dbqkv_p[:, 0, si * hp : (si + 1) * hp].reshape(
            nl, num_heads, lanes
        )[..., :head_dim]                                     # [L, H, D]
        slots.append(w)
        bslots.append(b)
    dwqkv = jnp.stack(slots, axis=3).reshape(nl, e, num_heads * 3 * head_dim)
    dbqkv = jnp.stack(bslots, axis=2).reshape(nl, num_heads * 3 * head_dim)
    dwout = dwout_p.reshape(nl, num_heads, lanes, e)[:, :, :head_dim, :].reshape(
        nl, num_heads * head_dim, e
    )
    t = layers
    return {
        "norm1": {
            "scale": unlift(dn1s, t["norm1"]["scale"]).astype(
                t["norm1"]["scale"].dtype
            ),
            "bias": unlift(dn1b, t["norm1"]["bias"]).astype(
                t["norm1"]["bias"].dtype
            ),
        },
        "mixer": {
            "wqkv": {
                "w": dwqkv.reshape(t["mixer"]["wqkv"]["w"].shape).astype(
                    t["mixer"]["wqkv"]["w"].dtype
                ),
                "b": dbqkv.reshape(t["mixer"]["wqkv"]["b"].shape).astype(
                    t["mixer"]["wqkv"]["b"].dtype
                ),
            },
            "out": {
                "w": dwout.reshape(t["mixer"]["out"]["w"].shape).astype(
                    t["mixer"]["out"]["w"].dtype
                ),
                "b": unlift(dbout, t["mixer"]["out"]["b"]).astype(
                    t["mixer"]["out"]["b"].dtype
                ),
            },
        },
        "norm2": {
            "scale": unlift(dn2s, t["norm2"]["scale"]).astype(
                t["norm2"]["scale"].dtype
            ),
            "bias": unlift(dn2b, t["norm2"]["bias"]).astype(
                t["norm2"]["bias"].dtype
            ),
        },
        "ffn_in": {
            "w": unlift(dwf1, t["ffn_in"]["w"]).astype(t["ffn_in"]["w"].dtype),
            "b": unlift(dbf1, t["ffn_in"]["b"]).astype(t["ffn_in"]["b"].dtype),
        },
        "ffn_out": {
            "w": unlift(dwf2, t["ffn_out"]["w"]).astype(t["ffn_out"]["w"].dtype),
            "b": unlift(dbf2, t["ffn_out"]["b"]).astype(t["ffn_out"]["b"].dtype),
        },
    }


# The VJP's own block plan: the backward step holds weight-grad accumulators
# + recompute scratch + dx in VMEM at once, so it runs a smaller window
# block than the inference-tuned forward (24). The math is block-invariant,
# so the primal (undifferentiated) call keeps the inference plan while the
# under-vjp forward/backward use these. WB=16 measured 137.4M/128M VMEM at
# the production encoder geometry (E=512, LP=208, dual stack) — the row
# scratch and activation blocks scale with WB, so 8 fits with margin.
BWD_WINDOW_BLOCK = 8
BWD_FWD_FFN_CHUNKS = 2
BWD_FFN_CHUNKS = 4


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_encoder_diff(x_emb, tok_len, layers, slopes, scale, num_heads):
    """Differentiable fused window encoder. The primal (not under vjp) is
    exactly the inference-tuned ``fused_window_encoder``; under
    ``jax.grad``/``jax.vjp`` the forward checkpoints per-layer inputs and a
    recompute Pallas backward produces d(x_emb) and d(layers). tok_len and
    slopes get zero cotangents (ALiBi slopes are not learned)."""
    return fused_window_encoder(
        x_emb, tok_len, layers, slopes, scale, num_heads
    )


def _diff_fwd(x_emb, tok_len, layers, slopes, scale, num_heads,
              window_block=BWD_WINDOW_BLOCK, ffn_chunks=BWD_FWD_FFN_CHUNKS):
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
    out, xsave = _run_encoder(
        x_emb, tok_len, weights, slopes, scale, num_heads, window_block,
        ffn_chunks, num_layers, lambda wb, layer: layer, save_inputs=True,
    )
    # zero-element carrier: residual pytrees may hold only JAX types, and
    # ints would become tracers under jit — the carrier's STATIC shape and
    # dtype transport (n, l, x_emb.dtype) to the backward at zero cost.
    carrier = jnp.zeros((n, l, 0), x_emb.dtype)
    return out[:n], (xsave, tok_len, layers, slopes, carrier)


def _diff_bwd(scale, num_heads, res, dout,
              window_block=BWD_WINDOW_BLOCK, ffn_chunks=BWD_FFN_CHUNKS):
    xsave, tok_len, layers, slopes, carrier = res
    n, l, _ = carrier.shape
    x_dtype = carrier.dtype
    num_layers, n_pad, lp, e = xsave.shape
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)

    weights = _pack_weights(layers, num_heads, head_dim, lanes)
    bias, kbias = _masks(tok_len, lp, slopes, num_heads)

    # Pooling backward seeds the dx chain:
    # pooled = sum_pos(x * valid) / max(tok_len, 1).
    dpool = jnp.zeros((n_pad, e), jnp.float32).at[:n].set(
        dout.astype(jnp.float32)
    )
    valid = (
        jnp.arange(lp)[None, :] < tok_len[:, None]
    ).astype(jnp.float32)                                    # [N_pad, LP]
    denom = jnp.maximum(tok_len.astype(jnp.float32), 1.0)[:, None]
    dnext = (
        dpool[:, None, :] * (valid / denom)[:, :, None]
    ).astype(jnp.bfloat16)                                   # [N_pad, LP, E]

    per_layer_dws: list = [None] * num_layers
    for layer in reversed(range(num_layers)):
        dnext, dws_l = _run_layer_bwd(
            xsave, tok_len, dnext, weights, bias, kbias, scale, num_heads,
            window_block, ffn_chunks, layer,
            lambda wb, li: li, lambda wb: wb == 0,
        )
        per_layer_dws[layer] = dws_l
    dws = [
        jnp.concatenate([per_layer_dws[li][k] for li in range(num_layers)])
        for k in range(len(weights))
    ]
    dx = dnext[:n, :l].astype(x_dtype)
    dlayers = _unpack_weight_grads(dws, layers, num_heads, head_dim, lanes)
    # integer primal -> float0 cotangent (JAX's symbolic zero for ints)
    dtok = np.zeros((n,), dtype=jax.dtypes.float0)
    dslopes = None if slopes is None else jnp.zeros_like(slopes)
    return (dx, dtok, dlayers, dslopes)


fused_window_encoder_diff.defvjp(_diff_fwd, _diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_window_encoder_dual_diff(
    x_emb_a, tok_len_a, layers_a, x_emb_b, tok_len_b, layers_b,
    slopes, scale, num_heads,
):
    """Differentiable dual-stack fused encoder (see
    ``fused_window_encoder_dual``). The primal is the inference-tuned dual
    kernel; under vjp, both stacks backprop in the same per-layer sweeps —
    each layer's backward call accumulates TWO weight-gradient slots, one per
    stack, switching at the A/B block boundary."""
    return fused_window_encoder_dual(
        x_emb_a, tok_len_a, layers_a, x_emb_b, tok_len_b, layers_b,
        slopes, scale, num_heads,
    )


def _dual_pad_concat(x_emb_a, tok_len_a, x_emb_b, tok_len_b, window_block):
    na, l, e = x_emb_a.shape
    nb = x_emb_b.shape[0]
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
    return x_emb, tok_len, na_pad, nb_pad, lp


def _diff_dual_fwd(x_emb_a, tok_len_a, layers_a, x_emb_b, tok_len_b, layers_b,
                   slopes, scale, num_heads):
    wb = BWD_WINDOW_BLOCK
    na, l, e = x_emb_a.shape
    nb = x_emb_b.shape[0]
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)
    num_layers = layers_a["norm1"]["scale"].shape[0]

    x_emb, tok_len, na_pad, nb_pad, lp = _dual_pad_concat(
        x_emb_a, tok_len_a, x_emb_b, tok_len_b, wb
    )
    wa = _pack_weights(layers_a, num_heads, head_dim, lanes)
    wb_ = _pack_weights(layers_b, num_heads, head_dim, lanes)
    weights = [jnp.concatenate([a, b], axis=0) for a, b in zip(wa, wb_)]
    a_blocks = na_pad // wb
    out, xsave = _run_encoder(
        x_emb, tok_len, weights, slopes, scale, num_heads, wb,
        BWD_FWD_FFN_CHUNKS, num_layers,
        lambda w, layer: layer + jnp.where(w >= a_blocks, num_layers, 0),
        save_inputs=True,
    )
    carrier_a = jnp.zeros((na, l, 0), x_emb_a.dtype)
    carrier_b = jnp.zeros((nb, l, 0), x_emb_b.dtype)
    res = (xsave, tok_len, layers_a, layers_b, slopes, carrier_a, carrier_b)
    return (out[:na], out[na_pad : na_pad + nb]), res


def _diff_dual_bwd(scale, num_heads, res, douts):
    wb = BWD_WINDOW_BLOCK
    xsave, tok_len, layers_a, layers_b, slopes, carrier_a, carrier_b = res
    dout_a, dout_b = douts
    na, l, _ = carrier_a.shape
    nb = carrier_b.shape[0]
    num_layers, n_pad, lp, e = xsave.shape
    head_dim = e // num_heads
    lanes = _head_lanes(head_dim)
    na_pad = _roundup(na, wb)
    a_blocks = na_pad // wb

    wa = _pack_weights(layers_a, num_heads, head_dim, lanes)
    wb_p = _pack_weights(layers_b, num_heads, head_dim, lanes)
    weights = [jnp.concatenate([a, b], axis=0) for a, b in zip(wa, wb_p)]
    bias, kbias = _masks(tok_len, lp, slopes, num_heads)

    dpool = (
        jnp.zeros((n_pad, e), jnp.float32)
        .at[:na].set(dout_a.astype(jnp.float32))
        .at[na_pad : na_pad + nb].set(dout_b.astype(jnp.float32))
    )
    valid = (
        jnp.arange(lp)[None, :] < tok_len[:, None]
    ).astype(jnp.float32)
    denom = jnp.maximum(tok_len.astype(jnp.float32), 1.0)[:, None]
    dnext = (
        dpool[:, None, :] * (valid / denom)[:, :, None]
    ).astype(jnp.bfloat16)

    widx = lambda w, li: li + jnp.where(w >= a_blocks, num_layers, 0)
    init = lambda w: jnp.logical_or(w == 0, w == a_blocks)
    per_layer_dws: list = [None] * num_layers
    for layer in reversed(range(num_layers)):
        dnext, dws_l = _run_layer_bwd(
            xsave, tok_len, dnext, weights, bias, kbias, scale, num_heads,
            wb, BWD_FFN_CHUNKS, layer, widx, init, n_dw_slots=2,
        )
        per_layer_dws[layer] = dws_l
    dws_a = [
        jnp.concatenate([per_layer_dws[li][k][0:1] for li in range(num_layers)])
        for k in range(len(weights))
    ]
    dws_b = [
        jnp.concatenate([per_layer_dws[li][k][1:2] for li in range(num_layers)])
        for k in range(len(weights))
    ]
    dlayers_a = _unpack_weight_grads(dws_a, layers_a, num_heads, head_dim, lanes)
    dlayers_b = _unpack_weight_grads(dws_b, layers_b, num_heads, head_dim, lanes)
    dx_a = dnext[:na, :l].astype(carrier_a.dtype)
    dx_b = dnext[na_pad : na_pad + nb, :l].astype(carrier_b.dtype)
    dtok_a = np.zeros((na,), dtype=jax.dtypes.float0)
    dtok_b = np.zeros((nb,), dtype=jax.dtypes.float0)
    dslopes = None if slopes is None else jnp.zeros_like(slopes)
    return (dx_a, dtok_a, dlayers_a, dx_b, dtok_b, dlayers_b, dslopes)


fused_window_encoder_dual_diff.defvjp(_diff_dual_fwd, _diff_dual_bwd)
