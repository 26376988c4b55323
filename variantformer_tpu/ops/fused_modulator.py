"""Fused gene-modulator stack: all gene layers in one Pallas call.

The 25-layer gene stack is ~45% of the vcf2exp forward. Like the fused
window encoder, its activations can persist in VMEM across layers while
per-layer weights (and the layer's cross-attention K/V) stream through:

  * grid = (tissue-block, layer*2, donor): the layer axis is sequential and
    steps through two phases per layer; the DONOR axis is innermost so one
    phase's weight slab serves the whole donor batch before the next slab
    streams in — at d donors this divides the modulator's weight DMA by d
    versus per-donor launches. Each phase's matrix weights are packed into
    ONE slab operand indexed by the grid step, so only ~one phase's weights
    (plus the pipelined next slab) are resident in VMEM at a time. This is
    what makes the full-size model fit in 128 MB of VMEM.
      phase 0: LN1 + fused QKV proj + batched self-attention + self out-proj
               (+residual) + LN2 + cross-Q + cross-attention
      phase 1: cross out-proj (+residual) + LN3 + GeGLU FFN (+res_long)
    (An earlier 3-phase split with narrower slabs timed the same on-chip —
    grid-step count, not weight DMA, is the marginal cost at this size.)
  * cross-attention K/V are NOT computed in the kernel: they depend only on
    the layer's CRE intermediate (donor-shared across tissues), so the
    wrapper projects them once per layer in XLA ([L, C, 2*H*D]) and the
    kernel streams the layer's slice — round 1 recomputed them once per
    tissue-block (T/TB x wasted FLOPs),
  * the gene stream [TB, G1, E] lives in VMEM scratch for the whole depth;
    a second scratch buffer carries the intra-layer stream between phases,
  * heads are sliced UNPADDED at head_dim-offsets (48-offset lane slicing
    of VMEM values is verified on this Mosaic — scripts/
    mosaic_capability_probe.py), and out-projections are stored TRANSPOSED
    ([E, H*D]) so every slab shares the [E, cols] shape; the kernel
    contracts their second dims,
  * self-attention scores are a batched [TB, G1P, G1P] dot_general (batch
    dim = tissue: tissues never attend across blocks), so there is no
    block-diagonal score waste and the masks are [G1P, G1P].

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


def pick_tissue_block(t: int) -> int:
    """Smallest block >= 6 that tiles the tissue axis without padding waste.

    Larger blocks would amortize the per-block weight re-stream further, but
    the batched self-attention's per-head [TB, G1P, G1P] f32 score transients
    scale with TB and 9 already exceeds VMEM at full geometry (measured:
    TB=9 OOMs, TB=6 leaves ~30 MB headroom) — so 9 is never a candidate;
    a tissue count like 45 runs TB=6 with the wrapper's pad-to-48."""
    for b in (6, 7, 8):
        if t % b == 0:
            return b
    return min(t, 6)


def _kernel(
    lens_ref,      # [DB, 2] int32 scalar prefetch: (gene_len, cre_len)/donor
    slopes_ref,    # [H] f32 scalar prefetch: ALiBi slopes
    x_ref,         # [1, TB, G1P, E] this donor's tissue block
    ckv_ref,       # [1, 1, CP, 2*H*D] donor+layer cross K|V (XLA precompute)
    slab_ref,      # [1, E, SLAB] phase-packed matrix weights
    bias_ref,      # [1, 1, BIAS] phase-packed biases
    norm_ref,      # [1, 1, 4E] phase's pre-LN scale|bias pairs (2 norms max)
    dist_ref,      # [G1P, G1P] f32 |i-j| ALiBi distances (hoisted, loaded once)
    out_ref,       # [1, TB, G1P, E]
    x_state,       # [DB, TB, G1P, E] bf16 scratch: layer input (res_long)
    h_state,       # [DB, TB, G1P, E] bf16 scratch: intra-layer stream
    attn_scratch,  # [DB, TB*G1P, H*D] bf16 scratch (donor-indexed: the
                   #   cross-attn output crosses the phase boundary, i.e.
                   #   the interleaved donor steps, so it must not be shared)
    qkv_scratch,   # [TB*G1P, 3*H*D] bf16 scratch: staged projections
                   #   (written and consumed within one phase-0 step)
    score_scratch,   # [TB, G1P, G1P] f32: per-head self-attn scores (reused)
    cscore_scratch,  # [TB*G1P, CP] f32: per-head cross-attn scores (reused)
    *,
    num_layers: int,
    num_heads: int,
    head_dim: int,
    tissue_block: int,
    g1p: int,
    scale: float,
    ffn_dim: int,
):
    # Grid = (tissue_block, layer*2, donor): the DONOR axis is innermost so
    # one (tissue-block, phase) weight slab serves every donor before the
    # next slab streams in — weights cross HBM once per tissue-block sweep
    # for the WHOLE donor batch instead of once per donor (at d=4 this cuts
    # the modulator's weight DMA 4x). Per-donor gene streams persist in the
    # donor-indexed VMEM scratches across the layer sweep.
    step = pl.program_id(1)
    did = pl.program_id(2)
    phase = step % 2
    e = x_ref.shape[-1]
    lane = head_dim
    hp = num_heads * lane
    rows = tissue_block * g1p
    cp = ckv_ref.shape[2]
    gene_len = lens_ref[did, 0]
    cre_len = lens_ref[did, 1]

    @pl.when(step == 0)
    def _load():
        x_state[did] = x_ref[0].astype(jnp.bfloat16)

    def layer_norm(x, which):
        s = norm_ref[0, 0, 2 * e * which : 2 * e * which + e].astype(jnp.float32)
        b = norm_ref[0, 0, 2 * e * which + e : 2 * e * which + 2 * e].astype(
            jnp.float32
        )
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

    def proj(h_flat, col0, cols, bias_col0=None):
        w = slab_ref[0, :, col0 : col0 + cols]
        b0 = col0 if bias_col0 is None else bias_col0
        b = bias_ref[0, :, b0 : b0 + cols].astype(jnp.bfloat16)
        return matmul(h_flat, w).astype(jnp.bfloat16) + b

    def out_proj(a_flat, col0, bias_col0):
        # Transposed out-projection stored at slab col0; bias at bias_col0.
        wt = slab_ref[0, :, col0 : col0 + hp]
        b = bias_ref[0, :, bias_col0 : bias_col0 + e].astype(jnp.bfloat16)
        return (matmul_t(a_flat, wt).astype(jnp.bfloat16) + b).reshape(
            tissue_block, g1p, e
        )

    @pl.when(phase == 0)
    def _attention():
        x = x_state[did]
        h1 = layer_norm(x, 0).reshape(rows, e)
        # One fused [rows, E] @ [E, 3*HP] projection, staged in VMEM scratch:
        # keeping q/k/v as SSA values across the 32-head unroll costs ~60 MB
        # of register-allocator spill slots.
        qkv_scratch[...] = proj(h1, 0, 3 * hp)
        # Tissues never attend across blocks, so scores are computed as a
        # batched (batch dim = tissue) [TB, G1P, G1P] dot_general rather than
        # one [rows, rows] matmul with a block-diagonal mask — TBx fewer
        # score/PV FLOPs and a [G1P, G1P] mask instead of [rows, rows].
        # |i-j| comes from the hoisted dist operand (loaded once, not rebuilt
        # from two iotas every phase-0 step).
        j2 = jax.lax.broadcasted_iota(jnp.int32, (g1p, g1p), 1)
        valid = j2 < gene_len
        dist = dist_ref[...]
        for h in range(num_heads):
            c0 = h * lane
            qh = qkv_scratch[:, c0 : c0 + lane].reshape(tissue_block, g1p, lane)
            kh = qkv_scratch[:, hp + c0 : hp + c0 + lane].reshape(
                tissue_block, g1p, lane
            )
            vh = qkv_scratch[:, 2 * hp + c0 : 2 * hp + c0 + lane].reshape(
                tissue_block, g1p, lane
            )
            # Scores round-trip through ONE reused f32 VMEM scratch: without
            # it the register allocator keeps every unrolled head's
            # [TB, G1P, G1P] buffer live at once (~1 MB x num_heads of spill
            # slots — measured 34.5 MB at full geometry).
            bias = jnp.where(valid, -slopes_ref[h] * dist, MASK_VALUE)
            score_scratch[...] = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale + bias[None]
            s = score_scratch[...]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            attn_scratch[did, :, c0 : c0 + lane] = o.reshape(rows, lane).astype(
                jnp.bfloat16
            )
        sa = out_proj(attn_scratch[did], 3 * hp, 3 * hp)
        h = sa + x_state[did]
        h_state[did] = h
        # cross-Q at slab col 4*HP; its bias after b_out, at 3*HP + E.
        h2n = layer_norm(h, 1).reshape(rows, e)
        qkv_scratch[:, 0:hp] = proj(h2n, 4 * hp, hp, bias_col0=3 * hp + e)
        jc = jax.lax.broadcasted_iota(jnp.int32, (rows, cp), 1)
        cbias = jnp.where(jc < cre_len, 0.0, MASK_VALUE)
        for h in range(num_heads):
            c0 = h * lane
            qh = qkv_scratch[:, c0 : c0 + lane]
            kh = ckv_ref[0, 0, :, c0 : c0 + lane]
            vh = ckv_ref[0, 0, :, hp + c0 : hp + c0 + lane]
            cscore_scratch[...] = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + cbias
            s = cscore_scratch[...]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            attn_scratch[did, :, c0 : c0 + lane] = o.astype(jnp.bfloat16)

    @pl.when(phase == 1)
    def _cross_out_and_ffn():
        ca = out_proj(attn_scratch[did], 0, 0)
        h2 = ca + h_state[did]
        g = layer_norm(h2, 0).reshape(rows, e)
        # GeGLU in at slab col HP; its bias at bias col E (after b_co).
        f = proj(g, hp, ffn_dim, bias_col0=e)
        half = ffn_dim // 2
        value, gate = f[:, :half], f[:, half:]
        f = value * jax.nn.gelu(
            gate.astype(jnp.float32), approximate=True
        ).astype(jnp.bfloat16)
        wt = slab_ref[0, :, hp + ffn_dim : hp + ffn_dim + half]
        b = bias_ref[0, :, e + ffn_dim : 2 * e + ffn_dim].astype(jnp.bfloat16)
        o = (matmul_t(f, wt).astype(jnp.bfloat16) + b).reshape(
            tissue_block, g1p, e
        )
        x_state[did] = o + x_state[did]

    @pl.when(step == 2 * num_layers - 1)
    def _store():
        out_ref[0] = x_state[did]


def _roundup(n, m):
    return -(-n // m) * m


def pack_gene_layers(layers: dict, num_heads: int, head_dim: int) -> dict:
    """Pre-pack stacked gene-layer params into the kernel's slab operands.

    Call ONCE at model-load time (e.g. VCFProcessor.set_params) and pass the
    result to ``fused_gene_modulator_packed`` — packing pads/transposes the
    whole gene stack (~1 GB at full size), which must not run per forward.
    """
    num_layers, e, _ = layers["mixer"]["wqkv"]["w"].shape
    hp = num_heads * head_dim
    ffn = layers["ffn_in"]["w"].shape[-1]
    # Slab layout per phase (cols; all slabs share width SLAB). Bias offsets
    # differ where an out-projection's bias (width E) sits between wider
    # projections:
    #   phase 0 (attention): wq | wk | wv | wo^T | cq        -> 5*HP
    #     biases: bq|bk|bv at 0,HP,2HP | b_out(E) at 3HP | b_cq at 3HP+E
    #   phase 1 (cross-out + ffn): cwo^T | wf1 | wf2^T       -> HP+ffn+ffn//2
    #     biases: b_co(E) at 0 | b_f1 at E | b_f2(E) at E+ffn
    slab_cols = _roundup(max(5 * hp, hp + ffn + ffn // 2), 128)
    bias_cols = _roundup(max(3 * hp + e + hp, 2 * e + ffn), 128)

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
    # Cross K/V packed (H, 2, D): exposed for the wrapper's per-layer XLA
    # precompute (NOT packed into a slab).
    cwkv = layers["cross"]["wkv"]["w"].reshape(num_layers, e, num_heads, 2, head_dim)
    cbkv = layers["cross"]["wkv"]["b"].reshape(num_layers, num_heads, 2, head_dim)
    ckv_w = cast(
        jnp.concatenate([cwkv[..., 0, :], cwkv[..., 1, :]], axis=-2).reshape(
            num_layers, e, 2 * hp
        )
    )
    ckv_b = cast(
        jnp.concatenate([cbkv[:, :, 0, :], cbkv[:, :, 1, :]], axis=-2).reshape(
            num_layers, 2 * hp
        )
    )
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
        b = jnp.zeros((num_layers, 1, bias_cols), jnp.bfloat16)
        for v, col in vecs_at:
            b = b.at[:, 0, col : col + v.shape[-1]].set(cast(v))
        return b

    slab = jnp.stack(
        [
            slab_phase([qkv[0][0], qkv[1][0], qkv[2][0], wo_t, cq[0]]),
            slab_phase([cwo_t, layers["ffn_in"]["w"], wf2_t]),
        ],
        axis=1,
    ).reshape(num_layers * 2, e, slab_cols)
    biases = jnp.stack(
        [
            bias_phase([(qkv[0][1], 0), (qkv[1][1], hp), (qkv[2][1], 2 * hp),
                        (layers["mixer"]["out"]["b"], 3 * hp),
                        (cq[1], 3 * hp + e)]),
            bias_phase([(layers["cross"]["out"]["b"], 0),
                        (layers["ffn_in"]["b"], e),
                        (layers["ffn_out"]["b"], e + ffn)]),
        ],
        axis=1,
    ).reshape(num_layers * 2, 1, bias_cols)
    # Phase 0 applies LN1 (pre-self-attn) then LN2 (pre-cross); phase 1
    # applies LN3 (pre-FFN). Each norm row packs scale|bias|scale|bias.
    ln = {
        n: jnp.concatenate(
            [layers[n]["scale"], layers[n]["bias"]], axis=-1
        ).astype(jnp.float32)
        for n in ("norm1", "norm2", "norm3")
    }
    zeros = jnp.zeros_like(ln["norm3"])
    norms = jnp.stack(
        [
            jnp.concatenate([ln["norm1"], ln["norm2"]], axis=-1),
            jnp.concatenate([ln["norm3"], zeros], axis=-1),
        ],
        axis=1,
    ).reshape(num_layers * 2, 1, 4 * e)
    return {
        "slab": slab, "biases": biases, "norms": norms,
        "ckv_w": ckv_w, "ckv_b": ckv_b,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "ffn", "num_heads", "head_dim", "scale", "tissue_block", "donor_block"
    ),
)
def fused_gene_modulator_packed(
    gene_stream: jax.Array,        # [D, T, G1, E] (or [T, G1, E]: one donor)
    cre_intermediates: jax.Array,  # [num_layers, D, C, E] (or [num_layers, C, E])
    gene_len: jax.Array,           # [D] int32 valid gene rows (incl registry)
    cre_len: jax.Array,            # [D] int32 valid CRE windows
    packed: dict,                  # output of pack_gene_layers
    slopes: jax.Array | None,      # [H] ALiBi slopes or None
    ffn: int,                      # GeGLU input width (pre-split)
    scale: float,
    num_heads: int,
    head_dim: int,
    tissue_block: int = 6,
    donor_block: int = 4,
) -> jax.Array:
    """Returns the final gene stream [D, T, G1, E] (bf16; [T, G1, E] when
    called with single-donor inputs).

    The whole donor batch runs in ONE kernel with the donor axis innermost
    in the grid (see _kernel): weights stream once per tissue-block sweep
    for all donors. Donor batches larger than ``donor_block`` are processed
    in chunks so the donor-indexed VMEM scratches stay bounded.
    """
    single = gene_stream.ndim == 3
    if single:
        gene_stream = gene_stream[None]
        cre_intermediates = cre_intermediates[:, None]
        gene_len = jnp.reshape(gene_len, (1,))
        cre_len = jnp.reshape(cre_len, (1,))
    d, t, g1, e = gene_stream.shape
    num_layers, _, c, _ = cre_intermediates.shape
    hp = num_heads * head_dim
    slab, biases, norms = packed["slab"], packed["biases"], packed["norms"]
    slab_cols = slab.shape[-1]
    bias_cols = biases.shape[-1]
    assert slab.shape[0] == num_layers * 2

    g1p = _roundup(g1, 16)
    tp = _roundup(t, tissue_block)
    cp = _roundup(c, 128)
    x = jnp.zeros((d, tp, g1p, e), jnp.bfloat16)
    x = x.at[:, :t, :g1].set(gene_stream.astype(jnp.bfloat16))
    # Per-(layer, donor) cross K/V from the donor-shared CRE intermediates,
    # computed once in XLA (0.12 TF/donor at full size) instead of once per
    # tissue block in the kernel (round 1 cost ~1.1 TF ≈ 11 ms).
    # XLA:CPU (the interpreter-mode test rig) cannot execute a batched
    # bf16 x bf16 -> f32 dot; feed it f32 operands there.
    op_dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    ckv = jnp.einsum(
        "ldce,lef->dlcf",
        cre_intermediates.astype(op_dt),
        packed["ckv_w"].astype(op_dt),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16) + packed["ckv_b"][None, :, None, :]
    ckv_p = jnp.zeros((d, num_layers, cp, 2 * hp), jnp.bfloat16)
    ckv_p = ckv_p.at[:, :, :c].set(ckv)

    lens = jnp.stack(
        [gene_len.astype(jnp.int32), cre_len.astype(jnp.int32)], axis=-1
    )  # [D, 2]
    if slopes is None:
        slopes = jnp.zeros((num_heads,), jnp.float32)
    dist = jnp.abs(
        jax.lax.broadcasted_iota(jnp.int32, (g1p, g1p), 0)
        - jax.lax.broadcasted_iota(jnp.int32, (g1p, g1p), 1)
    ).astype(jnp.float32)

    def run(x_d, ckv_d, lens_d):
        db = x_d.shape[0]
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
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(tp // tissue_block, num_layers * 2, db),
                in_specs=[
                    pl.BlockSpec(
                        (1, tissue_block, g1p, e),
                        lambda tb, s, dd, *_: (dd, tb, 0, 0),
                    ),
                    pl.BlockSpec(
                        (1, 1, cp, 2 * hp),
                        lambda tb, s, dd, *_: (dd, s // 2, 0, 0),
                    ),
                    pl.BlockSpec(
                        (1, e, slab_cols), lambda tb, s, dd, *_: (s, 0, 0)
                    ),
                    pl.BlockSpec(
                        (1, 1, bias_cols), lambda tb, s, dd, *_: (s, 0, 0)
                    ),
                    pl.BlockSpec(
                        (1, 1, 4 * e), lambda tb, s, dd, *_: (s, 0, 0)
                    ),
                    pl.BlockSpec((g1p, g1p), lambda tb, s, dd, *_: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, tissue_block, g1p, e),
                    lambda tb, s, dd, *_: (dd, tb, 0, 0),
                ),
                scratch_shapes=[
                    pltpu.VMEM((db, tissue_block, g1p, e), jnp.bfloat16),
                    pltpu.VMEM((db, tissue_block, g1p, e), jnp.bfloat16),
                    pltpu.VMEM((db, tissue_block * g1p, hp), jnp.bfloat16),
                    pltpu.VMEM((tissue_block * g1p, 3 * hp), jnp.bfloat16),
                    pltpu.VMEM((tissue_block, g1p, g1p), jnp.float32),
                    pltpu.VMEM((tissue_block * g1p, cp), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((db, tp, g1p, e), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=127 * 2**20,
            ),
            interpret=(jax.default_backend() == "cpu"),
        )(lens_d, slopes.astype(jnp.float32), x_d, ckv_d, slab, biases,
          norms, dist)

    outs = [
        run(x[d0 : d0 + donor_block], ckv_p[d0 : d0 + donor_block],
            lens[d0 : d0 + donor_block])
        for d0 in range(0, d, donor_block)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    out = out[:, :t, :g1]
    return out[0] if single else out


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
