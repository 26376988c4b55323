"""Fused gene-modulator stack: all gene layers in one Pallas call.

The 25-layer gene stack is ~45% of the vcf2exp forward. Like the fused
window encoder, its activations can persist in VMEM across layers while
per-layer weights (and the layer's CRE intermediate) stream through:

  * grid = (tissue-block, layer*3): the inner axis is sequential and steps
    through three phases per layer — self-attention, cross-attention, FFN.
    Each phase's matrix weights are packed into ONE slab operand indexed by
    the grid step, so only ~one phase's weights (plus the pipelined next
    slab) are resident in VMEM at a time. This is what makes the full-size
    model fit: a whole layer's padded weights are ~60 MB, one phase's ~25 MB.
  * the gene stream [TB, G1, E] lives in VMEM scratch for the whole depth;
    a second scratch buffer carries the intra-layer stream between phases,
  * heads are sliced UNPADDED at head_dim-offsets (48-offset lane slicing
    of VMEM values is verified on this Mosaic — scripts/
    mosaic_capability_probe.py; round 1's 64-lane padding cost 1.33x on
    every projection), and out-projections are stored TRANSPOSED
    ([E, H*D]) so every slab shares the [E, cols] shape; the kernel
    contracts their second dims,
  * self-attention scores are a batched [TB, G1P, G1P] dot_general (batch
    dim = tissue: tissues never attend across blocks), so there is no
    block-diagonal score waste and the masks are [G1P, G1P],
  * cross-attention K/V are projected from the layer's CRE intermediate
    once per layer into VMEM scratch and shared by all tissue rows.

Semantics mirror models/seq2gene._gene_layer with only_cross_attention=False
(the shipped configuration; reference seq2gene/modules/layers.py:88-165):
pre-LN self-attn with symmetric ALiBi, pre-LN cross-attn over the CRE
stream, GeGLU FFN whose residual adds the layer *input* (res_long). GELU
uses the tanh approximation (Mosaic has no erf lowering; error < bf16
resolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    lens_ref,      # [2] int32 scalar prefetch: (gene_len, cre_len)
    slopes_ref,    # [H] f32 scalar prefetch: ALiBi slopes
    x_ref,         # [TB, G1P, E]
    cre_ref,       # [1, CP, E] layer's CRE intermediate
    slab_ref,      # [1, E, SLAB] phase-packed matrix weights
    bias_ref,      # [1, 1, SLAB] phase-packed biases
    norm_ref,      # [1, 1, 2E] phase's pre-LN scale|bias
    out_ref,       # [TB, G1P, E]
    x_state,       # [TB, G1P, E] bf16 scratch: layer input (res_long)
    h_state,       # [TB, G1P, E] bf16 scratch: intra-layer stream
    attn_scratch,  # [TB*G1P, H*D] bf16 scratch
    qkv_scratch,   # [TB*G1P, 3*H*D] bf16 scratch: staged q|k|v projections
    ck_scratch,    # [CP, H*D] bf16 scratch
    cv_scratch,    # [CP, H*D] bf16 scratch
    *,
    num_layers: int,
    num_heads: int,
    head_dim: int,
    tissue_block: int,
    g1p: int,
    scale: float,
    ffn_dim: int,
):
    step = pl.program_id(1)
    phase = step % 3
    e = x_ref.shape[-1]
    lane = head_dim
    hp = num_heads * lane
    rows = tissue_block * g1p
    cp = cre_ref.shape[1]
    gene_len = lens_ref[0]
    cre_len = lens_ref[1]

    @pl.when(step == 0)
    def _load():
        x_state[...] = x_ref[...].astype(jnp.bfloat16)

    def layer_norm(x):
        s = norm_ref[0, 0, :e].astype(jnp.float32)
        b = norm_ref[0, 0, e:].astype(jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * s + b).astype(x.dtype)

    def matmul(a, w):  # [R, E] @ [E, C] -> [R, C] f32
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def matmul_t(a, wt):  # [R, C] @ [E, C]^T -> [R, E] f32
        return jax.lax.dot_general(
            a, wt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def softmax_rows(s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def headwise_attention(q_ref, k_ref, v_ref, bias_of_head):
        # Slice each head straight from VMEM refs — holding whole-projection
        # values live across the head unroll spills to scoped VMEM.
        for h in range(num_heads):
            c0 = h * lane
            qh = q_ref[:, c0 : c0 + lane]
            kh = k_ref[:, c0 : c0 + lane]
            vh = v_ref[:, c0 : c0 + lane]
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
            attn_scratch[:, c0 : c0 + lane] = o.astype(jnp.bfloat16)

    def proj(h_flat, col0, cols):
        w = slab_ref[0, :, col0 : col0 + cols]
        b = bias_ref[0, :, col0 : col0 + cols].astype(jnp.bfloat16)
        return matmul(h_flat, w).astype(jnp.bfloat16) + b

    def out_proj(a_flat, col0, bias_col0):
        wt = slab_ref[0, :, col0 : col0 + hp]
        b = bias_ref[0, :, bias_col0 : bias_col0 + e].astype(jnp.bfloat16)
        return (matmul_t(a_flat, wt).astype(jnp.bfloat16) + b).reshape(
            tissue_block, g1p, e
        )

    @pl.when(phase == 0)
    def _self_attention():
        x = x_state[...]
        h1 = layer_norm(x).reshape(rows, e)
        # Stage q|k|v in VMEM scratch: keeping them as SSA values across the
        # 32-head unroll costs ~60 MB of register-allocator spill slots.
        qkv_scratch[:, 0:hp] = proj(h1, 0, hp)
        qkv_scratch[:, hp : 2 * hp] = proj(h1, hp, hp)
        qkv_scratch[:, 2 * hp : 3 * hp] = proj(h1, 2 * hp, hp)
        # Tissues never attend across blocks, so scores are computed as a
        # batched (batch dim = tissue) [TB, G1P, G1P] dot_general rather than
        # one [rows, rows] matmul with a block-diagonal mask — TBx fewer
        # score/PV FLOPs and a [G1P, G1P] mask instead of [rows, rows].
        i2 = jax.lax.broadcasted_iota(jnp.int32, (g1p, g1p), 0)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (g1p, g1p), 1)
        valid = j2 < gene_len
        dist = jnp.abs(i2 - j2).astype(jnp.float32)
        for h in range(num_heads):
            c0 = h * lane
            qh = qkv_scratch[:, c0 : c0 + lane].reshape(tissue_block, g1p, lane)
            kh = qkv_scratch[:, hp + c0 : hp + c0 + lane].reshape(
                tissue_block, g1p, lane
            )
            vh = qkv_scratch[:, 2 * hp + c0 : 2 * hp + c0 + lane].reshape(
                tissue_block, g1p, lane
            )
            s = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            bias = jnp.where(valid, -slopes_ref[h] * dist, MASK_VALUE)
            s = s + bias[None]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            attn_scratch[:, c0 : c0 + lane] = o.reshape(rows, lane).astype(
                jnp.bfloat16
            )
        sa = out_proj(attn_scratch[...], 3 * hp, 3 * hp)
        h_state[...] = sa + x

    @pl.when(phase == 1)
    def _cross_attention():
        h = h_state[...]
        h2n = layer_norm(h).reshape(rows, e)
        qkv_scratch[:, 0:hp] = proj(h2n, 0, hp)
        cre = cre_ref[0].astype(jnp.bfloat16)
        ck_scratch[...] = (
            matmul(cre, slab_ref[0, :, hp : 2 * hp]).astype(jnp.bfloat16)
            + bias_ref[0, :, hp : 2 * hp].astype(jnp.bfloat16)
        )
        cv_scratch[...] = (
            matmul(cre, slab_ref[0, :, 2 * hp : 3 * hp]).astype(jnp.bfloat16)
            + bias_ref[0, :, 2 * hp : 3 * hp].astype(jnp.bfloat16)
        )
        jc = jax.lax.broadcasted_iota(jnp.int32, (rows, cp), 1)
        cvalid = jc < cre_len

        def cross_bias(h):
            return jnp.where(cvalid, 0.0, MASK_VALUE)

        headwise_attention(qkv_scratch, ck_scratch, cv_scratch, cross_bias)
        ca = out_proj(attn_scratch[...], 3 * hp, 3 * hp)
        h_state[...] = ca + h

    @pl.when(phase == 2)
    def _ffn():
        h2 = h_state[...]
        g = layer_norm(h2).reshape(rows, e)
        f = proj(g, 0, ffn_dim)
        half = ffn_dim // 2
        value, gate = f[:, :half], f[:, half:]
        f = value * jax.nn.gelu(
            gate.astype(jnp.float32), approximate=True
        ).astype(jnp.bfloat16)
        wt = slab_ref[0, :, ffn_dim : ffn_dim + half]
        b = bias_ref[0, :, ffn_dim : ffn_dim + e].astype(jnp.bfloat16)
        o = (matmul_t(f, wt).astype(jnp.bfloat16) + b).reshape(
            tissue_block, g1p, e
        )
        x_state[...] = o + x_state[...]

    @pl.when(step == 3 * num_layers - 1)
    def _store():
        out_ref[...] = x_state[...]


def _roundup(n, m):
    return -(-n // m) * m


def pack_gene_layers(layers: dict, num_heads: int, head_dim: int) -> dict:
    """Pre-pack stacked gene-layer params into the kernel's slab operands.

    Call ONCE at model-load time (e.g. VCFProcessor.set_params) and pass the
    result to ``fused_gene_modulator_packed`` — packing pads/transposes the
    whole gene stack (~1.2 GB at full size), which must not run per forward.
    """
    num_layers, e, _ = layers["mixer"]["wqkv"]["w"].shape
    hp = num_heads * head_dim
    ffn = layers["ffn_in"]["w"].shape[-1]
    # Slab layout per phase (cols, all slabs share width SLAB):
    #   phase 0 (self):  wq | wk | wv | wo^T          -> 4*HP
    #   phase 1 (cross): cwq | cwk | cwv | cwo^T      -> 4*HP
    #   phase 2 (ffn):   wf1 | wf2^T                  -> ffn + ffn//2
    slab_cols = _roundup(max(4 * hp, ffn + ffn // 2), 128)

    cast = lambda a: a.astype(jnp.bfloat16)
    # Head-major packed QKV (H, 3, D) -> per-slot [L, E, H*D], unpadded.
    wqkv = layers["mixer"]["wqkv"]["w"].reshape(num_layers, e, num_heads, 3, head_dim)
    bqkv = layers["mixer"]["wqkv"]["b"].reshape(num_layers, num_heads, 3, head_dim)
    qkv = [
        (
            wqkv[:, :, :, i, :].reshape(num_layers, e, hp),
            bqkv[:, :, i, :].reshape(num_layers, hp),
        )
        for i in range(3)
    ]
    # Cross K/V packed (H, 2, D); cross Q is a plain [E, H*D] projection.
    cwkv = layers["cross"]["wkv"]["w"].reshape(num_layers, e, num_heads, 2, head_dim)
    cbkv = layers["cross"]["wkv"]["b"].reshape(num_layers, num_heads, 2, head_dim)
    ckv = [
        (
            cwkv[:, :, :, i, :].reshape(num_layers, e, hp),
            cbkv[:, :, i, :].reshape(num_layers, hp),
        )
        for i in range(2)
    ]
    cq = (layers["cross"]["wq"]["w"], layers["cross"]["wq"]["b"])
    wo_t = layers["mixer"]["out"]["w"].transpose(0, 2, 1)   # [L, E, H*D]
    cwo_t = layers["cross"]["out"]["w"].transpose(0, 2, 1)  # [L, E, H*D]
    wf2_t = layers["ffn_out"]["w"].transpose(0, 2, 1)  # [L, E, ffn//2]

    def slab_phase(mats):
        s = jnp.zeros((num_layers, e, slab_cols), jnp.bfloat16)
        col = 0
        for m in mats:
            s = s.at[:, :, col : col + m.shape[-1]].set(cast(m))
            col += m.shape[-1]
        return s

    def bias_phase(vecs_at):  # [(vec [L, X], col0), ...]
        b = jnp.zeros((num_layers, 1, slab_cols), jnp.bfloat16)
        for v, col in vecs_at:
            b = b.at[:, 0, col : col + v.shape[-1]].set(cast(v))
        return b

    slab = jnp.stack(
        [
            slab_phase([qkv[0][0], qkv[1][0], qkv[2][0], wo_t]),
            slab_phase([cq[0], ckv[0][0], ckv[1][0], cwo_t]),
            slab_phase([layers["ffn_in"]["w"], wf2_t]),
        ],
        axis=1,
    ).reshape(num_layers * 3, e, slab_cols)
    hp_ = hp
    biases = jnp.stack(
        [
            bias_phase([(qkv[0][1], 0), (qkv[1][1], hp_), (qkv[2][1], 2 * hp_),
                        (layers["mixer"]["out"]["b"], 3 * hp_)]),
            bias_phase([(cq[1], 0), (ckv[0][1], hp_), (ckv[1][1], 2 * hp_),
                        (layers["cross"]["out"]["b"], 3 * hp_)]),
            bias_phase([(layers["ffn_in"]["b"], 0),
                        (layers["ffn_out"]["b"], ffn)]),
        ],
        axis=1,
    ).reshape(num_layers * 3, 1, slab_cols)
    norms = jnp.stack(
        [
            jnp.concatenate(
                [layers[n]["scale"], layers[n]["bias"]], axis=-1
            ).astype(jnp.float32)
            for n in ("norm1", "norm2", "norm3")
        ],
        axis=1,
    ).reshape(num_layers * 3, 1, 2 * e)
    return {"slab": slab, "biases": biases, "norms": norms}


@functools.partial(
    jax.jit, static_argnames=("ffn", "num_heads", "head_dim", "scale", "tissue_block")
)
def fused_gene_modulator_packed(
    gene_stream: jax.Array,        # [T, G1, E] registry + gene tokens (one donor)
    cre_intermediates: jax.Array,  # [num_layers, C, E]
    gene_len: jax.Array,           # scalar int32 valid gene rows (incl registry)
    cre_len: jax.Array,            # scalar int32 valid CRE windows
    packed: dict,                  # output of pack_gene_layers
    slopes: jax.Array | None,      # [H] ALiBi slopes or None
    ffn: int,                      # GeGLU input width (pre-split)
    scale: float,
    num_heads: int,
    head_dim: int,
    tissue_block: int = 6,
) -> jax.Array:
    """Returns the final gene stream [T, G1, E] (bf16)."""
    t, g1, e = gene_stream.shape
    num_layers, c, _ = cre_intermediates.shape
    hp = num_heads * head_dim
    slab, biases, norms = packed["slab"], packed["biases"], packed["norms"]
    slab_cols = slab.shape[-1]
    assert slab.shape[0] == num_layers * 3

    g1p = _roundup(g1, 16)
    tp = _roundup(t, tissue_block)
    cp = _roundup(c, 128)
    x = jnp.zeros((tp, g1p, e), jnp.bfloat16)
    x = x.at[:t, :g1].set(gene_stream.astype(jnp.bfloat16))
    cre = jnp.zeros((num_layers, cp, e), jnp.bfloat16)
    cre = cre.at[:, :c].set(cre_intermediates.astype(jnp.bfloat16))

    kernel = functools.partial(
        _kernel,
        num_layers=num_layers,
        num_heads=num_heads,
        head_dim=head_dim,
        tissue_block=tissue_block,
        g1p=g1p,
        scale=scale,
        ffn_dim=ffn,
    )
    lens = jnp.stack([gene_len, cre_len]).astype(jnp.int32)
    if slopes is None:
        slopes = jnp.zeros((num_heads,), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(tp // tissue_block, num_layers * 3),
            in_specs=[
                pl.BlockSpec((tissue_block, g1p, e), lambda tb, s, *_: (tb, 0, 0)),
                pl.BlockSpec((1, cp, e), lambda tb, s, *_: (s // 3, 0, 0)),
                pl.BlockSpec((1, e, slab_cols), lambda tb, s, *_: (s, 0, 0)),
                pl.BlockSpec((1, 1, slab_cols), lambda tb, s, *_: (s, 0, 0)),
                pl.BlockSpec((1, 1, 2 * e), lambda tb, s, *_: (s, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (tissue_block, g1p, e), lambda tb, s, *_: (tb, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((tissue_block, g1p, e), jnp.bfloat16),
                pltpu.VMEM((tissue_block, g1p, e), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, 3 * hp), jnp.bfloat16),
                pltpu.VMEM((cp, hp), jnp.bfloat16),
                pltpu.VMEM((cp, hp), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((tp, g1p, e), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=127 * 2**20,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(lens, slopes.astype(jnp.float32), x, cre, slab, biases, norms)
    return out[:t, :g1]


@functools.partial(
    jax.jit, static_argnames=("num_heads", "head_dim", "scale", "tissue_block")
)
def fused_gene_modulator(
    gene_stream: jax.Array,
    cre_intermediates: jax.Array,
    gene_len: jax.Array,
    cre_len: jax.Array,
    layers: dict,
    slopes: jax.Array | None,
    scale: float,
    num_heads: int,
    head_dim: int,
    tissue_block: int = 6,
) -> jax.Array:
    """Convenience wrapper: packs per call. Prefer pack_gene_layers once at
    load time + fused_gene_modulator_packed on the hot path."""
    packed = pack_gene_layers(layers, num_heads, head_dim)
    return fused_gene_modulator_packed(
        gene_stream, cre_intermediates, gene_len, cre_len, packed, slopes,
        layers["ffn_in"]["w"].shape[-1], scale, num_heads, head_dim,
        tissue_block,
    )
