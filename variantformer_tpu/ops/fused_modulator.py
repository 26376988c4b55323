"""Fused gene-modulator stack: all gene layers in one Pallas call (prototype).

Round-2 work item (NOTES.md "Fused-modulator design"): the 25-layer gene
stack is ~45% of the vcf2exp forward. Like the fused window encoder, its
activations can persist in VMEM across layers while per-layer weights (and
the layer's CRE intermediate) stream through:

  * grid = (tissue-block, layer); layer is the inner, sequential axis,
  * the gene stream [TB, G1, E] lives in VMEM scratch for the whole depth,
  * per-layer weights are zero-padded so each head occupies 64 lanes
    (head_dim 48 -> 64; 64-offset lane slicing of VMEM values is verified to
    work on this Mosaic), and the out-projections carry matching zero rows,
  * self-attention is computed per head over the whole [TB*G1, TB*G1] row
    space with a block-diagonal mask (tissues don't attend across blocks),
    so each head is one large MXU matmul instead of TB small ones,
  * cross-attention K/V are projected from the layer's CRE intermediate
    once per layer into VMEM scratch and shared by all tissue rows.

Semantics mirror models/seq2gene._gene_layer with only_cross_attention=False
(the shipped configuration; reference seq2gene/modules/layers.py:88-165):
pre-LN self-attn with symmetric ALiBi, pre-LN cross-attn over the CRE
stream, GeGLU FFN whose residual adds the layer *input* (res_long). GELU
uses the tanh approximation (Mosaic has no erf lowering; error < bf16
resolution).

STATUS: correctness-validated in interpreter mode (tests/test_fused_modulator.py)
and NOT wired into seq2gene_forward yet. The remaining round-2 work is
VMEM fit on real hardware: one layer's padded weights are ~60 MB, which
with double-buffering exceeds v5e VMEM — the plan is to phase-pack the
weights into a single streamed slab operand (grid (tb, layer*phases)) so
only one phase's weights are resident per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANE = 64  # per-head padded width (head_dim 48 -> 64)


def _kernel(
    lens_ref,      # [2] int32 scalar prefetch: (gene_len, cre_len)
    slopes_ref,    # [H] f32 scalar prefetch: ALiBi slopes
    x_ref,         # [TB, G1P, E]
    cre_ref,       # [1, CP, E] layer's CRE intermediate
    n1s_ref, n1b_ref,                       # [1, 1, E]
    wq_ref, wk_ref, wv_ref,                 # [1, E, H*64]
    bq_ref, bk_ref, bv_ref,                 # [1, 1, H*64]
    wo_ref, bo_ref,                         # [1, H*64, E], [1, 1, E]
    n2s_ref, n2b_ref,                       # [1, 1, E]
    cwq_ref, cbq_ref,                       # [1, E, H*64], [1, 1, H*64]
    cwk_ref, cwv_ref,                       # [1, E, H*64]
    cbk_ref, cbv_ref,                       # [1, 1, H*64]
    cwo_ref, cbo_ref,                       # [1, H*64, E], [1, 1, E]
    n3s_ref, n3b_ref,                       # [1, 1, E]
    wf1_ref, bf1_ref,                       # [1, E, F], [1, 1, F]
    wf2_ref, bf2_ref,                       # [1, F//2, E], [1, 1, E]
    out_ref,       # [TB, G1P, E]
    x_state,       # [TB, G1P, E] bf16 scratch (persists across layer steps)
    attn_scratch,  # [TB*G1P, H*64] bf16 scratch
    ck_scratch,    # [CP, H*64] bf16 scratch
    cv_scratch,    # [CP, H*64] bf16 scratch
    *,
    num_layers: int,
    num_heads: int,
    tissue_block: int,
    g1p: int,
    scale: float,
):
    layer = pl.program_id(1)
    e = x_ref.shape[-1]
    rows = tissue_block * g1p
    cp = cre_ref.shape[1]
    gene_len = lens_ref[0]
    cre_len = lens_ref[1]

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

    # Block-diagonal self-attention mask + symmetric ALiBi distance, shared
    # by every head (slope applied per head from SMEM).
    i2 = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    rj = j2 % g1p
    allowed = ((i2 // g1p) == (j2 // g1p)) & (rj < gene_len)
    self_mask = jnp.where(allowed, 0.0, MASK_VALUE)          # [rows, rows] f32
    dist = jnp.abs(i2 % g1p - rj).astype(jnp.float32)
    jc = jax.lax.broadcasted_iota(jnp.int32, (rows, cp), 1)
    cross_mask = jnp.where(jc < cre_len, 0.0, MASK_VALUE)    # [rows, CP] f32

    def softmax_rows(s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def headwise_attention(q_all, k_all, v_all, bias_of_head, n_k):
        for h in range(num_heads):
            c0 = h * LANE
            qh = q_all[:, c0 : c0 + LANE]
            kh = k_all[: n_k, c0 : c0 + LANE]
            vh = v_all[: n_k, c0 : c0 + LANE]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_of_head(h)
            p = softmax_rows(s)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            attn_scratch[:, c0 : c0 + LANE] = o.astype(jnp.bfloat16)

    x = x_state[...]

    # --- self-attention over the gene stream -----------------------------
    h1 = layer_norm(
        x, n1s_ref[0].astype(jnp.float32), n1b_ref[0].astype(jnp.float32)
    ).reshape(rows, e)
    q = matmul(h1, wq_ref[0]).astype(jnp.bfloat16) + bq_ref[0].astype(jnp.bfloat16)
    k = matmul(h1, wk_ref[0]).astype(jnp.bfloat16) + bk_ref[0].astype(jnp.bfloat16)
    v = matmul(h1, wv_ref[0]).astype(jnp.bfloat16) + bv_ref[0].astype(jnp.bfloat16)
    headwise_attention(
        q, k, v, lambda h: self_mask - slopes_ref[h] * dist, rows
    )
    sa = (
        matmul(attn_scratch[...], wo_ref[0]).astype(jnp.bfloat16)
        + bo_ref[0].astype(jnp.bfloat16)
    ).reshape(tissue_block, g1p, e)
    h = sa + x

    # --- cross-attention to the layer's CRE intermediate -----------------
    h2n = layer_norm(
        h, n2s_ref[0].astype(jnp.float32), n2b_ref[0].astype(jnp.float32)
    ).reshape(rows, e)
    q2 = (
        matmul(h2n, cwq_ref[0]).astype(jnp.bfloat16)
        + cbq_ref[0].astype(jnp.bfloat16)
    )
    cre = cre_ref[0].astype(jnp.bfloat16)
    ck_scratch[...] = (
        matmul(cre, cwk_ref[0]).astype(jnp.bfloat16)
        + cbk_ref[0].astype(jnp.bfloat16)
    )
    cv_scratch[...] = (
        matmul(cre, cwv_ref[0]).astype(jnp.bfloat16)
        + cbv_ref[0].astype(jnp.bfloat16)
    )
    headwise_attention(
        q2, ck_scratch[...], cv_scratch[...], lambda h: cross_mask, cp
    )
    ca = (
        matmul(attn_scratch[...], cwo_ref[0]).astype(jnp.bfloat16)
        + cbo_ref[0].astype(jnp.bfloat16)
    ).reshape(tissue_block, g1p, e)
    h2 = ca + h

    # --- GeGLU FFN, residual to the layer input (res_long) ---------------
    g = layer_norm(
        h2, n3s_ref[0].astype(jnp.float32), n3b_ref[0].astype(jnp.float32)
    ).reshape(rows, e)
    f = matmul(g, wf1_ref[0]).astype(jnp.bfloat16) + bf1_ref[0].astype(jnp.bfloat16)
    half = f.shape[-1] // 2
    value, gate = f[:, :half], f[:, half:]
    f = value * jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
        jnp.bfloat16
    )
    o = (
        matmul(f, wf2_ref[0]).astype(jnp.bfloat16) + bf2_ref[0].astype(jnp.bfloat16)
    ).reshape(tissue_block, g1p, e)
    x_state[...] = o + x

    @pl.when(layer == num_layers - 1)
    def _store():
        out_ref[...] = x_state[...]


def _pad_head_cols(w, b, num_heads, head_dim):
    """[L, E, H*D] projection -> [L, E, H*64] with zero lanes after each head."""
    nl, e_in = w.shape[0], w.shape[1]
    w = w.reshape(nl, e_in, num_heads, head_dim)
    wp = jnp.zeros((nl, e_in, num_heads, LANE), w.dtype).at[..., :head_dim].set(w)
    b = b.reshape(nl, num_heads, head_dim)
    bp = jnp.zeros((nl, num_heads, LANE), b.dtype).at[..., :head_dim].set(b)
    return (
        wp.reshape(nl, e_in, num_heads * LANE),
        bp.reshape(nl, 1, num_heads * LANE),
    )


def _pad_head_rows(w, num_heads, head_dim):
    """[L, H*D, E] out-projection -> [L, H*64, E] with zero rows per head."""
    nl, e_out = w.shape[0], w.shape[2]
    w = w.reshape(nl, num_heads, head_dim, e_out)
    wp = jnp.zeros((nl, num_heads, LANE, e_out), w.dtype)
    wp = wp.at[:, :, :head_dim, :].set(w)
    return wp.reshape(nl, num_heads * LANE, e_out)


def _roundup(n, m):
    return -(-n // m) * m


@functools.partial(
    jax.jit, static_argnames=("num_heads", "head_dim", "scale", "tissue_block")
)
def fused_gene_modulator(
    gene_stream: jax.Array,        # [T, G1, E] registry + gene tokens (one donor)
    cre_intermediates: jax.Array,  # [num_layers, C, E]
    gene_len: jax.Array,           # scalar int32 valid gene rows (incl registry)
    cre_len: jax.Array,            # scalar int32 valid CRE windows
    layers: dict,                  # stacked context-layer params (models/init layout)
    slopes: jax.Array | None,      # [H] ALiBi slopes or None
    scale: float,
    num_heads: int,
    head_dim: int,
    tissue_block: int = 6,
) -> jax.Array:
    """Returns the final gene stream [T, G1, E] (bf16)."""
    t, g1, e = gene_stream.shape
    num_layers, c, _ = cre_intermediates.shape
    assert head_dim <= LANE
    hp = num_heads * LANE
    ffn = layers["ffn_in"]["w"].shape[-1]

    g1p = _roundup(g1, 16)
    tp = _roundup(t, tissue_block)
    cp = _roundup(c, 128)
    x = jnp.zeros((tp, g1p, e), jnp.bfloat16)
    x = x.at[:t, :g1].set(gene_stream.astype(jnp.bfloat16))
    cre = jnp.zeros((num_layers, cp, e), jnp.bfloat16)
    cre = cre.at[:, :c].set(cre_intermediates.astype(jnp.bfloat16))

    cast = lambda a: a.astype(jnp.bfloat16)
    # Head-major packed QKV (H, 3, D) -> per-slot padded [L, E, H*64].
    wqkv = layers["mixer"]["wqkv"]["w"].reshape(num_layers, e, num_heads, 3, head_dim)
    bqkv = layers["mixer"]["wqkv"]["b"].reshape(num_layers, num_heads, 3, head_dim)
    packed = [
        _pad_head_cols(
            wqkv[:, :, :, i, :].reshape(num_layers, e, num_heads * head_dim),
            bqkv[:, :, i, :].reshape(num_layers, num_heads * head_dim),
            num_heads, head_dim,
        )
        for i in range(3)
    ]
    (wq, bq), (wk, bk), (wv, bv) = packed
    # Cross K/V packed (H, 2, D); cross Q is a plain [E, H*D] projection.
    cwkv = layers["cross"]["wkv"]["w"].reshape(num_layers, e, num_heads, 2, head_dim)
    cbkv = layers["cross"]["wkv"]["b"].reshape(num_layers, num_heads, 2, head_dim)
    cross_kv = [
        _pad_head_cols(
            cwkv[:, :, :, i, :].reshape(num_layers, e, num_heads * head_dim),
            cbkv[:, :, i, :].reshape(num_layers, num_heads * head_dim),
            num_heads, head_dim,
        )
        for i in range(2)
    ]
    (cwk, cbk), (cwv, cbv) = cross_kv
    cwq, cbq = _pad_head_cols(
        layers["cross"]["wq"]["w"], layers["cross"]["wq"]["b"],
        num_heads, head_dim,
    )
    wo = _pad_head_rows(layers["mixer"]["out"]["w"], num_heads, head_dim)
    cwo = _pad_head_rows(layers["cross"]["out"]["w"], num_heads, head_dim)

    vec = lambda a: a[:, None, :]  # [L, X] -> [L, 1, X] (untiled leading dims)
    weights = [
        vec(layers["norm1"]["scale"]), vec(layers["norm1"]["bias"]),
        cast(wq), cast(wk), cast(wv), cast(bq), cast(bk), cast(bv),
        cast(wo), vec(cast(layers["mixer"]["out"]["b"])),
        vec(layers["norm2"]["scale"]), vec(layers["norm2"]["bias"]),
        cast(cwq), cast(cbq), cast(cwk), cast(cwv), cast(cbk), cast(cbv),
        cast(cwo), vec(cast(layers["cross"]["out"]["b"])),
        vec(layers["norm3"]["scale"]), vec(layers["norm3"]["bias"]),
        cast(layers["ffn_in"]["w"]), vec(cast(layers["ffn_in"]["b"])),
        cast(layers["ffn_out"]["w"]), vec(cast(layers["ffn_out"]["b"])),
    ]

    kernel = functools.partial(
        _kernel,
        num_layers=num_layers,
        num_heads=num_heads,
        tissue_block=tissue_block,
        g1p=g1p,
        scale=scale,
    )
    w_specs = [
        pl.BlockSpec(
            (1, *w.shape[1:]),
            (lambda tb, layer, *_, nd=w.ndim: (layer,) + (0,) * (nd - 1)),
        )
        for w in weights
    ]
    lens = jnp.stack([gene_len, cre_len]).astype(jnp.int32)
    if slopes is None:
        slopes = jnp.zeros((num_heads,), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(tp // tissue_block, num_layers),
            in_specs=[
                pl.BlockSpec((tissue_block, g1p, e), lambda tb, layer, *_: (tb, 0, 0)),
                pl.BlockSpec((1, cp, e), lambda tb, layer, *_: (layer, 0, 0)),
                *w_specs,
            ],
            out_specs=pl.BlockSpec(
                (tissue_block, g1p, e), lambda tb, layer, *_: (tb, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((tissue_block, g1p, e), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((cp, hp), jnp.bfloat16),
                pltpu.VMEM((cp, hp), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((tp, g1p, e), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=120 * 2**20,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(lens, slopes.astype(jnp.float32), x, cre, *weights)
    return out[:t, :g1]
