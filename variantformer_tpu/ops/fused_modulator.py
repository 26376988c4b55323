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


def pick_tissue_block(t: int, d: int = 1) -> int:
    """Tissue-block choice, donor-aware (measured on v5e at full geometry,
    scripts/modulator_vmem_probe.py, t=54):

      d=1: TB=6 fits (120.7 ms/donor; TB=9 OOMs, TB=6 leaves ~30 MB),
      d>=2 (donor-folded grid): the donor-indexed x/h/attn scratches scale
      with TB*db, so TB=6 OOMs at db>=2; TB=4 wins even with t=54's pad to
      56 (4x4: 110.8 ms/donor, 3x4: 114.1, 4x2: 118.0).

    Larger blocks amortize the per-block weight re-stream further, but the
    batched self-attention's per-head [TB, G1P, G1P] f32 score transients
    and the per-donor VMEM state cap TB; a tissue count like 45 runs with
    the wrapper's pad-to-next-multiple."""
    if d >= 2:
        return min(t, 4)
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
    *rest,         # save_inputs=True: xsave_ref, hsave_ref (both
                   #   [1, 1, TB, G1P, E], the VJP's checkpoint stream), then:
                   # x_state,      [DB, TB, G1P, E] bf16: layer input (res_long)
                   # h_state,      [DB, TB, G1P, E] bf16: intra-layer stream
                   # attn_scratch, [DB, TB*G1P, H*D] bf16 (donor-indexed: the
                   #   cross-attn output crosses the phase boundary, i.e.
                   #   the interleaved donor steps, so it must not be shared)
                   # qkv_scratch,  [TB*G1P, 3*H*D] bf16: staged projections
                   #   (written and consumed within one phase-0 step)
                   # score_scratch,  [TB, G1P, G1P] f32: self-attn scores
                   # cscore_scratch, [TB*G1P, CP] f32: cross-attn scores
    num_layers: int,
    num_heads: int,
    head_dim: int,
    tissue_block: int,
    g1p: int,
    scale: float,
    ffn_dim: int,
    save_inputs: bool = False,
):
    if save_inputs:
        xsave_ref, hsave_ref = rest[0], rest[1]
        rest = rest[2:]
    else:
        xsave_ref = hsave_ref = None
    (x_state, h_state, attn_scratch, qkv_scratch,
     score_scratch, cscore_scratch) = rest
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
        if save_inputs:
            # Layer-input checkpoint for the recompute backward (_bwd0/_bwd1).
            xsave_ref[0, 0] = x
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
        if save_inputs:
            # Post-self-attention residual: checkpointing it lets the
            # phase-1 backward skip re-running self-attention.
            hsave_ref[0, 0] = h
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


def _prep_inputs(
    gene_stream, cre_intermediates, gene_len, cre_len, packed, slopes,
    num_heads, head_dim, tissue_block,
):
    """Shared forward-input prep: pad the gene stream to kernel tiles,
    precompute the per-(donor, layer) cross K/V in XLA, and build the lens/
    slopes/dist operands. Returns (x, ckv_p, lens, slopes, dist, tp, g1p, cp).
    """
    d, t, g1, e = gene_stream.shape
    num_layers, _, c, _ = cre_intermediates.shape
    hp = num_heads * head_dim
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
    return x, ckv_p, lens, slopes.astype(jnp.float32), dist, tp, g1p, cp


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
    num_layers = cre_intermediates.shape[0]
    hp = num_heads * head_dim
    slab, biases, norms = packed["slab"], packed["biases"], packed["norms"]
    slab_cols = slab.shape[-1]
    bias_cols = biases.shape[-1]
    assert slab.shape[0] == num_layers * 2

    x, ckv_p, lens, slopes, dist, tp, g1p, cp = _prep_inputs(
        gene_stream, cre_intermediates, gene_len, cre_len, packed,
        slopes, num_heads, head_dim, tissue_block,
    )

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


# ---------------------------------------------------------------------------
# Backward: custom VJP for the fused gene modulator
# ---------------------------------------------------------------------------
#
# Counterpart capability: flash-attn's backward kernels, which the reference's
# training era relied on (/root/reference/seq2gene/modules/layers.py:6-10).
# Same design family as ops/fused_encoder's VJP, adapted to the modulator's
# two-attention layer:
#
#   * The forward (save_inputs=True) checkpoints TWO streams per layer to
#     HBM: the layer INPUT x_l (res_long) and the post-self-attention
#     residual h_l. Saving h_l lets the phase-1 backward skip re-running
#     self-attention; everything else is recomputed in-kernel.
#   * The backward runs TWO pallas_calls per layer, in reverse layer order
#     (the layer axis is an XLA-level loop, same rationale as the encoder:
#     interpreter mode cannot test cross-sweep aliasing):
#       _bwd1: cross-attention + FFN backward from h_l — recomputes
#              LN2/cross-Q/cross-attention/cross-out/LN3/GeGLU, emits dh
#              (cotangent of h_l), the per-donor cross-K/V cotangent d_ckv,
#              and the phase-1 weight gradients;
#       _bwd0: self-attention + LN1 backward from x_l and dh — recomputes
#              LN1/QKV/self-attention, emits dx = dnext + dh + dLN1 and the
#              phase-0 weight gradients.
#   * Weight-gradient outputs have constant block indexes and accumulate in
#     VMEM across the whole (donor, tissue-block) sweep via in-place slice
#     adds (zero-initialized at the sweep's first step) — accumulating
#     through the ref, not SSA temporaries, so at most one [E, cols]
#     contribution is live at a time (E=1536 makes whole-phase SSA
#     accumulators ~38 MB; the encoder could afford them at E=512).
#   * d_ckv blocks are indexed by donor with the tissue-block axis innermost,
#     so each donor's block accumulates across consecutive grid steps.
#   * Cross K/V cotangents leave the kernel per (layer, donor); the XLA side
#     turns them into d(cre_intermediates) and the cross wkv grads (the
#     forward computes ckv in XLA too — same boundary).
#
# Gradient zero-flow invariants (tested): pad tissues and pad gene rows carry
# zero incoming cotangent and contribute exactly zero to every dW (their
# outgoing rows are zero), masked CRE slots get zero d_ckv.

from variantformer_tpu.ops.fused_encoder import (  # noqa: E402
    _gelu_tanh,
    _gelu_tanh_grad,
    _ln_bwd,
    _ln_fwd_vals,
)

# The backward steps hold an [E, ~6K] f32 weight-grad accumulator plus
# recompute scratch, so they run a smaller tissue block than the
# inference-tuned forward; the math is block-invariant.
BWD_TISSUE_BLOCK = 3


def _bwd_tissue_block(tp: int) -> int:
    for b in (BWD_TISSUE_BLOCK, 2, 1):
        if tp % b == 0:
            return b
    return 1


def _mm(a, w):  # [R, E] @ [E, C] -> [R, C] f32
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_t(a, wt):  # [R, C] contract dim1 with wt [E, C] dim1 -> [R, E] f32
    return jax.lax.dot_general(
        a, wt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_rows(a, b):  # [R, K] x [R, C] -> [K, C] f32 (contract rows)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _bwd1_kernel(
    lens_ref,      # [D, 2] int32 scalar prefetch
    hsave_ref,     # [1, 1, TB, G1P, E] bf16: this layer's post-self-attn h
    ckv_ref,       # [1, 1, CP, 2*HP] bf16: this (donor, layer) cross K|V
    dnext_ref,     # [1, TB, G1P, E] bf16: cotangent of the layer OUTPUT
    w1_ref,        # [1, E, W1] bf16: cq | cwo^T | wf1 | wf2^T
    bias0_ref,     # [1, 1, BIAS] bf16: phase-0 bias row (b_cq lives here)
    bias1_ref,     # [1, 1, BIAS] bf16: phase-1 bias row
    norm0_ref,     # [1, 1, 4E] f32: norm1|norm2 row
    norm1_ref,     # [1, 1, 4E] f32: norm3|zeros row
    # outputs
    dh_ref,        # [1, TB, G1P, E] bf16: cotangent of h_l
    dckv_ref,      # [1, CP, 2*HP] f32 (per donor; accumulates over TB sweep)
    dw1_ref,       # [E, W1] f32 (accumulates over the whole sweep)
    dbias0_ref,    # [1, BIAS] f32 (only the b_cq span is nonzero)
    dbias1_ref,    # [1, BIAS] f32
    dnorm0_ref,    # [1, 4E] f32 (only the norm2 half is nonzero)
    dnorm1_ref,    # [1, 4E] f32
    # scratch
    qc_scratch,    # [TB*G1P, HP] bf16: recomputed cross-Q
    car_scratch,   # [TB*G1P, HP] bf16: recomputed cross-attn output (raw)
    dcar_scratch,  # [TB*G1P, HP] bf16: its cotangent
    dqc_scratch,   # [TB*G1P, HP] bf16
    cscore_scratch,   # [TB*G1P, CP] f32
    dckv_acc,      # [CP, 2*HP] f32: per-head dk/dv staging for this step
    *,
    num_heads: int,
    head_dim: int,
    tissue_block: int,
    g1p: int,
    scale: float,
    ffn_dim: int,
):
    did = pl.program_id(0)
    tb = pl.program_id(1)
    e = hsave_ref.shape[-1]
    lane = head_dim
    hp = num_heads * lane
    rows = tissue_block * g1p
    cp = ckv_ref.shape[2]
    cre_len = lens_ref[did, 1]
    f32 = jnp.float32
    first = jnp.logical_and(did == 0, tb == 0)

    @pl.when(first)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dbias0_ref[...] = jnp.zeros_like(dbias0_ref)
        dbias1_ref[...] = jnp.zeros_like(dbias1_ref)
        dnorm0_ref[...] = jnp.zeros_like(dnorm0_ref)
        dnorm1_ref[...] = jnp.zeros_like(dnorm1_ref)

    h = hsave_ref[0, 0]                                   # [TB, G1P, E] bf16
    s2 = norm0_ref[0, 0, 2 * e : 3 * e]
    b2 = norm0_ref[0, 0, 3 * e : 4 * e]
    s3 = norm1_ref[0, 0, 0:e]
    b3 = norm1_ref[0, 0, e : 2 * e]

    # ---- recompute: LN2 -> cross-Q -> cross-attention --------------------
    h2n_f, xhat2, rstd2 = _ln_fwd_vals(h, s2, b2)
    h2n = h2n_f.astype(jnp.bfloat16).reshape(rows, e)
    b_cq = bias0_ref[0, :, 3 * hp + e : 3 * hp + e + hp].astype(jnp.bfloat16)
    qc_scratch[...] = _mm(h2n, w1_ref[0, :, 0:hp]).astype(jnp.bfloat16) + b_cq
    jc = jax.lax.broadcasted_iota(jnp.int32, (rows, cp), 1)
    cbias = jnp.where(jc < cre_len, 0.0, MASK_VALUE)
    for hd in range(num_heads):
        c0 = hd * lane
        qh = qc_scratch[:, c0 : c0 + lane]
        kh = ckv_ref[0, 0, :, c0 : c0 + lane]
        vh = ckv_ref[0, 0, :, hp + c0 : hp + c0 + lane]
        cscore_scratch[...] = (
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) * scale + cbias
        )
        s = cscore_scratch[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        car_scratch[:, c0 : c0 + lane] = o.astype(jnp.bfloat16)

    # ---- recompute: cross-out + LN3 + GeGLU-in ----------------------------
    b_co = bias1_ref[0, :, 0:e].astype(jnp.bfloat16)
    ca = (
        _mm_t(car_scratch[...], w1_ref[0, :, hp : 2 * hp]).astype(jnp.bfloat16)
        + b_co
    ).reshape(tissue_block, g1p, e)
    h2 = ca + h
    g_f, xhat3, rstd3 = _ln_fwd_vals(h2, s3, b3)
    g = g_f.astype(jnp.bfloat16).reshape(rows, e)
    b_f1 = bias1_ref[0, :, e : e + ffn_dim].astype(jnp.bfloat16)
    f = _mm(g, w1_ref[0, :, 2 * hp : 2 * hp + ffn_dim]).astype(jnp.bfloat16) + b_f1
    half = ffn_dim // 2
    value, gate = f[:, :half], f[:, half:]
    gate_f = gate.astype(f32)
    gelu_g = _gelu_tanh(gate_f)

    # ---- backward: FFN-out / GeGLU / LN3 ----------------------------------
    dnext = dnext_ref[0]
    dy = dnext.reshape(rows, e)
    hmid = (value.astype(f32) * gelu_g).astype(jnp.bfloat16)
    dw1_ref[:, 2 * hp + ffn_dim : 2 * hp + ffn_dim + half] += _mm_rows(dy, hmid)
    dbias1_ref[0, e + ffn_dim : 2 * e + ffn_dim] += jnp.sum(
        dy.astype(f32), axis=0
    )
    dfmid = _mm(dy, w1_ref[0, :, 2 * hp + ffn_dim : 2 * hp + ffn_dim + half])
    dvalue = dfmid * gelu_g
    dgate = dfmid * value.astype(f32) * _gelu_tanh_grad(gate_f)
    df = jnp.concatenate([dvalue, dgate], axis=-1).astype(jnp.bfloat16)
    dw1_ref[:, 2 * hp : 2 * hp + ffn_dim] += _mm_rows(g, df)
    dbias1_ref[0, e : e + ffn_dim] += jnp.sum(df.astype(f32), axis=0)
    dg = _mm_t(df, w1_ref[0, :, 2 * hp : 2 * hp + ffn_dim])
    dh2, dn3s, dn3b = _ln_bwd(dg.reshape(tissue_block, g1p, e), xhat3, rstd3, s3)
    dnorm1_ref[0, 0:e] += dn3s
    dnorm1_ref[0, e : 2 * e] += dn3b

    # ---- backward: cross out-projection ------------------------------------
    dca = dh2.reshape(rows, e).astype(jnp.bfloat16)
    dw1_ref[:, hp : 2 * hp] += _mm_rows(dca, car_scratch[...])
    dbias1_ref[0, 0:e] += jnp.sum(dca.astype(f32), axis=0)
    dcar_scratch[...] = _mm(dca, w1_ref[0, :, hp : 2 * hp]).astype(jnp.bfloat16)

    # ---- backward: cross attention (recomputing p per head) ---------------
    for hd in range(num_heads):
        c0 = hd * lane
        qh = qc_scratch[:, c0 : c0 + lane]
        kh = ckv_ref[0, 0, :, c0 : c0 + lane]
        vh = ckv_ref[0, 0, :, hp + c0 : hp + c0 + lane]
        cscore_scratch[...] = (
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) * scale + cbias
        )
        s = cscore_scratch[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        do = dcar_scratch[:, c0 : c0 + lane]
        p_b = p.astype(jnp.bfloat16)
        dv = _mm_rows(p_b, do)                               # [CP, lane]
        dp = _mm_t(do, vh)                                   # [rows, CP]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_b = (ds * scale).astype(jnp.bfloat16)
        dq = _mm(ds_b, kh)                                   # [rows, lane]
        dk = _mm_rows(ds_b, qh)                              # [CP, lane]
        dckv_acc[:, c0 : c0 + lane] = dk
        dckv_acc[:, hp + c0 : hp + c0 + lane] = dv
        dqc_scratch[:, c0 : c0 + lane] = dq.astype(jnp.bfloat16)

    @pl.when(tb == 0)
    def _dckv_init():
        dckv_ref[0] = dckv_acc[...]

    @pl.when(tb != 0)
    def _dckv_acc():
        dckv_ref[0] += dckv_acc[...]

    # ---- backward: cross-Q projection + LN2 --------------------------------
    dqc = dqc_scratch[...]
    dw1_ref[:, 0:hp] += _mm_rows(h2n, dqc)
    dbias0_ref[0, 3 * hp + e : 3 * hp + e + hp] += jnp.sum(
        dqc.astype(f32), axis=0
    )
    dh2n = _mm_t(dqc, w1_ref[0, :, 0:hp])
    dh_ln2, dn2s, dn2b = _ln_bwd(
        dh2n.reshape(tissue_block, g1p, e), xhat2, rstd2, s2
    )
    dnorm0_ref[0, 2 * e : 3 * e] += dn2s
    dnorm0_ref[0, 3 * e : 4 * e] += dn2b
    dh_ref[0] = (dh2 + dh_ln2).astype(jnp.bfloat16)


def _bwd0_kernel(
    lens_ref,      # [D, 2] int32 scalar prefetch
    slopes_ref,    # [H] f32 scalar prefetch
    xsave_ref,     # [1, 1, TB, G1P, E] bf16: this layer's INPUT
    dnext_ref,     # [1, TB, G1P, E] bf16: layer-output cotangent (res_long)
    dh_ref,        # [1, TB, G1P, E] bf16: cotangent of h_l (from _bwd1)
    w0_ref,        # [1, E, 4*HP] bf16: wq | wk | wv | wo^T
    bias0_ref,     # [1, 1, BIAS] bf16
    norm0_ref,     # [1, 1, 4E] f32
    dist_ref,      # [G1P, G1P] f32
    # outputs
    dx_ref,        # [1, TB, G1P, E] bf16: cotangent of x_l
    dw0_ref,       # [E, 4*HP] f32
    dbias0_ref,    # [1, BIAS] f32 (bqkv + b_out spans)
    dnorm0_ref,    # [1, 4E] f32 (norm1 half)
    # scratch
    qkv_scratch,   # [TB*G1P, 3*HP] bf16
    attn_scratch,  # [TB*G1P, HP] bf16
    dattn_scratch, # [TB*G1P, HP] bf16
    dqkv_scratch,  # [TB*G1P, 3*HP] bf16
    score_scratch,   # [TB, G1P, G1P] f32
    dscore_scratch,  # [TB, G1P, G1P] f32
    *,
    num_heads: int,
    head_dim: int,
    tissue_block: int,
    g1p: int,
    scale: float,
):
    did = pl.program_id(0)
    tb = pl.program_id(1)
    e = xsave_ref.shape[-1]
    lane = head_dim
    hp = num_heads * lane
    rows = tissue_block * g1p
    gene_len = lens_ref[did, 0]
    f32 = jnp.float32
    first = jnp.logical_and(did == 0, tb == 0)

    @pl.when(first)
    def _init():
        dw0_ref[...] = jnp.zeros_like(dw0_ref)
        dbias0_ref[...] = jnp.zeros_like(dbias0_ref)
        dnorm0_ref[...] = jnp.zeros_like(dnorm0_ref)

    x = xsave_ref[0, 0]
    s1 = norm0_ref[0, 0, 0:e]
    b1 = norm0_ref[0, 0, e : 2 * e]

    # ---- recompute: LN1 -> QKV -> self-attention ---------------------------
    h1_f, xhat1, rstd1 = _ln_fwd_vals(x, s1, b1)
    h1 = h1_f.astype(jnp.bfloat16).reshape(rows, e)
    bqkv = bias0_ref[0, :, 0 : 3 * hp].astype(jnp.bfloat16)
    qkv_scratch[...] = _mm(h1, w0_ref[0, :, 0 : 3 * hp]).astype(jnp.bfloat16) + bqkv
    j2 = jax.lax.broadcasted_iota(jnp.int32, (g1p, g1p), 1)
    valid = j2 < gene_len
    dist = dist_ref[...]
    for hd in range(num_heads):
        c0 = hd * lane
        qh = qkv_scratch[:, c0 : c0 + lane].reshape(tissue_block, g1p, lane)
        kh = qkv_scratch[:, hp + c0 : hp + c0 + lane].reshape(
            tissue_block, g1p, lane
        )
        vh = qkv_scratch[:, 2 * hp + c0 : 2 * hp + c0 + lane].reshape(
            tissue_block, g1p, lane
        )
        bias = jnp.where(valid, -slopes_ref[hd] * dist, MASK_VALUE)
        score_scratch[...] = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
        ) * scale + bias[None]
        s = score_scratch[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        attn_scratch[:, c0 : c0 + lane] = o.reshape(rows, lane).astype(
            jnp.bfloat16
        )

    # ---- backward: self out-projection (h = sa + x, so d_sa = dh) ----------
    dh = dh_ref[0]
    dsa = dh.reshape(rows, e).astype(jnp.bfloat16)
    dw0_ref[:, 3 * hp : 4 * hp] += _mm_rows(dsa, attn_scratch[...])
    dbias0_ref[0, 3 * hp : 3 * hp + e] += jnp.sum(dsa.astype(f32), axis=0)
    dattn_scratch[...] = _mm(dsa, w0_ref[0, :, 3 * hp : 4 * hp]).astype(
        jnp.bfloat16
    )

    # ---- backward: self attention (recomputing p per head) ----------------
    for hd in range(num_heads):
        c0 = hd * lane
        qh = qkv_scratch[:, c0 : c0 + lane].reshape(tissue_block, g1p, lane)
        kh = qkv_scratch[:, hp + c0 : hp + c0 + lane].reshape(
            tissue_block, g1p, lane
        )
        vh = qkv_scratch[:, 2 * hp + c0 : 2 * hp + c0 + lane].reshape(
            tissue_block, g1p, lane
        )
        bias = jnp.where(valid, -slopes_ref[hd] * dist, MASK_VALUE)
        score_scratch[...] = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
        ) * scale + bias[None]
        s = score_scratch[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        do = dattn_scratch[:, c0 : c0 + lane].reshape(
            tissue_block, g1p, lane
        )
        p_b = p.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(
            p_b, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )                                                    # [TB, G1Pk, lane]
        dscore_scratch[...] = jax.lax.dot_general(
            do, vh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )                                                    # [TB, G1Pq, G1Pk]
        dp = dscore_scratch[...]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_b = (ds * scale).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(
            ds_b, kh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )
        dk = jax.lax.dot_general(
            ds_b, qh, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )
        dqkv_scratch[:, c0 : c0 + lane] = dq.reshape(rows, lane).astype(
            jnp.bfloat16
        )
        dqkv_scratch[:, hp + c0 : hp + c0 + lane] = dk.reshape(
            rows, lane
        ).astype(jnp.bfloat16)
        dqkv_scratch[:, 2 * hp + c0 : 2 * hp + c0 + lane] = dv.reshape(
            rows, lane
        ).astype(jnp.bfloat16)

    # ---- backward: QKV projection + LN1 + residual sums --------------------
    dqkv = dqkv_scratch[...]
    dw0_ref[:, 0 : 3 * hp] += _mm_rows(h1, dqkv)
    dbias0_ref[0, 0 : 3 * hp] += jnp.sum(dqkv.astype(f32), axis=0)
    dh1 = _mm_t(dqkv, w0_ref[0, :, 0 : 3 * hp])
    dx_ln, dn1s, dn1b = _ln_bwd(
        dh1.reshape(tissue_block, g1p, e), xhat1, rstd1, s1
    )
    dnorm0_ref[0, 0:e] += dn1s
    dnorm0_ref[0, e : 2 * e] += dn1b
    dx = dnext_ref[0].astype(f32) + dh.astype(f32) + dx_ln
    dx_ref[0] = dx.astype(jnp.bfloat16)


def _run_fwd_save(
    x_d, ckv_d, lens_d, slab, biases, norms, dist, slopes,
    num_layers, num_heads, head_dim, tissue_block, g1p, scale, ffn,
):
    """Forward with per-layer x/h checkpointing to HBM (one donor chunk).
    Returns (out [DB, TP, G1P, E], xsave, hsave [L, DB, TB-padded...])."""
    db, tp, _, e = x_d.shape
    hp = num_heads * head_dim
    cp = ckv_d.shape[2]
    slab_cols = slab.shape[-1]
    bias_cols = biases.shape[-1]
    kernel = functools.partial(
        _kernel,
        num_layers=num_layers,
        num_heads=num_heads,
        head_dim=head_dim,
        tissue_block=tissue_block,
        g1p=g1p,
        scale=scale,
        ffn_dim=ffn,
        save_inputs=True,
    )
    out, xsave, hsave = pl.pallas_call(
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
                pl.BlockSpec((1, e, slab_cols), lambda tb, s, dd, *_: (s, 0, 0)),
                pl.BlockSpec((1, 1, bias_cols), lambda tb, s, dd, *_: (s, 0, 0)),
                pl.BlockSpec((1, 1, 4 * e), lambda tb, s, dd, *_: (s, 0, 0)),
                pl.BlockSpec((g1p, g1p), lambda tb, s, dd, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, tissue_block, g1p, e),
                    lambda tb, s, dd, *_: (dd, tb, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, tissue_block, g1p, e),
                    lambda tb, s, dd, *_: (s // 2, dd, tb, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, tissue_block, g1p, e),
                    lambda tb, s, dd, *_: (s // 2, dd, tb, 0, 0),
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((db, tissue_block, g1p, e), jnp.bfloat16),
                pltpu.VMEM((db, tissue_block, g1p, e), jnp.bfloat16),
                pltpu.VMEM((db, tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, 3 * hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block, g1p, g1p), jnp.float32),
                pltpu.VMEM((tissue_block * g1p, cp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((db, tp, g1p, e), jnp.bfloat16),
            jax.ShapeDtypeStruct((num_layers, db, tp, g1p, e), jnp.bfloat16),
            jax.ShapeDtypeStruct((num_layers, db, tp, g1p, e), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 2**20,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(lens_d, slopes, x_d, ckv_d, slab, biases, norms, dist)
    return out, xsave, hsave


def _run_bwd1(
    li, hsave, ckv_p, dnext, w1, biases, norms, lens,
    scale, num_heads, head_dim, tissue_block, ffn,
):
    """Layer li's phase-1 backward over the (donor, tissue-block) sweep."""
    num_layers, d, tp, g1p, e = hsave.shape
    hp = num_heads * head_dim
    cp = ckv_p.shape[2]
    w1_cols = w1.shape[-1]
    bias_cols = biases.shape[-1]
    kernel = functools.partial(
        _bwd1_kernel,
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
            num_scalar_prefetch=1,
            grid=(d, tp // tissue_block),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, tissue_block, g1p, e),
                    lambda dd, tb, *_, li=li: (li, dd, tb, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, cp, 2 * hp),
                    lambda dd, tb, *_, li=li: (dd, li, 0, 0),
                ),
                pl.BlockSpec(
                    (1, tissue_block, g1p, e), lambda dd, tb, *_: (dd, tb, 0, 0)
                ),
                pl.BlockSpec(
                    (1, e, w1_cols), lambda dd, tb, *_, li=li: (li, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bias_cols), lambda dd, tb, *_, li=li: (2 * li, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bias_cols),
                    lambda dd, tb, *_, li=li: (2 * li + 1, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 4 * e), lambda dd, tb, *_, li=li: (2 * li, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 4 * e), lambda dd, tb, *_, li=li: (2 * li + 1, 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, tissue_block, g1p, e), lambda dd, tb, *_: (dd, tb, 0, 0)
                ),
                pl.BlockSpec((1, cp, 2 * hp), lambda dd, tb, *_: (dd, 0, 0)),
                pl.BlockSpec((e, w1_cols), lambda dd, tb, *_: (0, 0)),
                pl.BlockSpec((1, bias_cols), lambda dd, tb, *_: (0, 0)),
                pl.BlockSpec((1, bias_cols), lambda dd, tb, *_: (0, 0)),
                pl.BlockSpec((1, 4 * e), lambda dd, tb, *_: (0, 0)),
                pl.BlockSpec((1, 4 * e), lambda dd, tb, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, cp), jnp.float32),
                pltpu.VMEM((cp, 2 * hp), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((d, tp, g1p, e), jnp.bfloat16),
            jax.ShapeDtypeStruct((d, cp, 2 * hp), jnp.float32),
            jax.ShapeDtypeStruct((e, w1_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, bias_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, bias_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * e), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 2**20,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(lens, hsave, ckv_p, dnext, w1, biases, biases, norms, norms)


def _run_bwd0(
    li, xsave, dnext, dh, w0, biases, norms, lens, slopes, dist,
    scale, num_heads, head_dim, tissue_block,
):
    """Layer li's phase-0 backward over the (donor, tissue-block) sweep."""
    num_layers, d, tp, g1p, e = xsave.shape
    hp = num_heads * head_dim
    w0_cols = w0.shape[-1]
    bias_cols = biases.shape[-1]
    kernel = functools.partial(
        _bwd0_kernel,
        num_heads=num_heads,
        head_dim=head_dim,
        tissue_block=tissue_block,
        g1p=g1p,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(d, tp // tissue_block),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, tissue_block, g1p, e),
                    lambda dd, tb, *_, li=li: (li, dd, tb, 0, 0),
                ),
                pl.BlockSpec(
                    (1, tissue_block, g1p, e), lambda dd, tb, *_: (dd, tb, 0, 0)
                ),
                pl.BlockSpec(
                    (1, tissue_block, g1p, e), lambda dd, tb, *_: (dd, tb, 0, 0)
                ),
                pl.BlockSpec(
                    (1, e, w0_cols), lambda dd, tb, *_, li=li: (li, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bias_cols), lambda dd, tb, *_, li=li: (2 * li, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 4 * e), lambda dd, tb, *_, li=li: (2 * li, 0, 0)
                ),
                pl.BlockSpec((g1p, g1p), lambda dd, tb, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, tissue_block, g1p, e), lambda dd, tb, *_: (dd, tb, 0, 0)
                ),
                pl.BlockSpec((e, w0_cols), lambda dd, tb, *_: (0, 0)),
                pl.BlockSpec((1, bias_cols), lambda dd, tb, *_: (0, 0)),
                pl.BlockSpec((1, 4 * e), lambda dd, tb, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tissue_block * g1p, 3 * hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block * g1p, 3 * hp), jnp.bfloat16),
                pltpu.VMEM((tissue_block, g1p, g1p), jnp.float32),
                pltpu.VMEM((tissue_block, g1p, g1p), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((d, tp, g1p, e), jnp.bfloat16),
            jax.ShapeDtypeStruct((e, w0_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, bias_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 2**20,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(lens, slopes, xsave, dnext, dh, w0, biases, norms, dist)


def _unpack_mod_grads(
    dw0, dw1, dbias0, dbias1, dnorm0, dnorm1, dckv_w, dckv_b,
    layers, num_heads, head_dim,
):
    """Packed-layout f32 gradients -> the stacked gene-layer params tree
    (inverse of pack_gene_layers' layout; transposed projections transpose
    back, head-major q|k|v / k|v blocks re-interleave)."""
    nl, e, _ = dw0.shape
    hp = num_heads * head_dim
    ffn = layers["ffn_in"]["w"].shape[-1]
    half = ffn // 2
    t = layers

    def cast(a, tmpl):
        return a.reshape(tmpl.shape).astype(tmpl.dtype)

    def inter3(a):  # [L, X, 3*hp] q|k|v blocks -> [L, X, H*3*D]
        parts = [
            a[..., i * hp : (i + 1) * hp].reshape(
                *a.shape[:-1], num_heads, head_dim
            )
            for i in range(3)
        ]
        return jnp.stack(parts, axis=-2).reshape(*a.shape[:-1], 3 * hp)

    def inter2(a):  # [L, X, 2*hp] k|v blocks -> [L, X, H*2*D]
        parts = [
            a[..., i * hp : (i + 1) * hp].reshape(
                *a.shape[:-1], num_heads, head_dim
            )
            for i in range(2)
        ]
        return jnp.stack(parts, axis=-2).reshape(*a.shape[:-1], 2 * hp)

    return {
        "norm1": {
            "scale": cast(dnorm0[:, 0, 0:e], t["norm1"]["scale"]),
            "bias": cast(dnorm0[:, 0, e : 2 * e], t["norm1"]["bias"]),
        },
        "norm2": {
            "scale": cast(dnorm0[:, 0, 2 * e : 3 * e], t["norm2"]["scale"]),
            "bias": cast(dnorm0[:, 0, 3 * e : 4 * e], t["norm2"]["bias"]),
        },
        "norm3": {
            "scale": cast(dnorm1[:, 0, 0:e], t["norm3"]["scale"]),
            "bias": cast(dnorm1[:, 0, e : 2 * e], t["norm3"]["bias"]),
        },
        "mixer": {
            "wqkv": {
                "w": cast(inter3(dw0[:, :, 0 : 3 * hp]), t["mixer"]["wqkv"]["w"]),
                "b": cast(inter3(dbias0[:, :, 0 : 3 * hp])[:, 0],
                          t["mixer"]["wqkv"]["b"]),
            },
            "out": {
                "w": cast(dw0[:, :, 3 * hp : 4 * hp].transpose(0, 2, 1),
                          t["mixer"]["out"]["w"]),
                "b": cast(dbias0[:, 0, 3 * hp : 3 * hp + e],
                          t["mixer"]["out"]["b"]),
            },
        },
        "cross": {
            "wq": {
                "w": cast(dw1[:, :, 0:hp], t["cross"]["wq"]["w"]),
                "b": cast(dbias0[:, 0, 3 * hp + e : 3 * hp + e + hp],
                          t["cross"]["wq"]["b"]),
            },
            "wkv": {
                "w": cast(inter2(dckv_w), t["cross"]["wkv"]["w"]),
                "b": cast(inter2(dckv_b[:, None, :])[:, 0],
                          t["cross"]["wkv"]["b"]),
            },
            "out": {
                "w": cast(dw1[:, :, hp : 2 * hp].transpose(0, 2, 1),
                          t["cross"]["out"]["w"]),
                "b": cast(dbias1[:, 0, 0:e], t["cross"]["out"]["b"]),
            },
        },
        "ffn_in": {
            "w": cast(dw1[:, :, 2 * hp : 2 * hp + ffn], t["ffn_in"]["w"]),
            "b": cast(dbias1[:, 0, e : e + ffn], t["ffn_in"]["b"]),
        },
        "ffn_out": {
            "w": cast(
                dw1[:, :, 2 * hp + ffn : 2 * hp + ffn + half].transpose(0, 2, 1),
                t["ffn_out"]["w"],
            ),
            "b": cast(dbias1[:, 0, e + ffn : 2 * e + ffn], t["ffn_out"]["b"]),
        },
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_gene_modulator_diff(
    gene_stream: jax.Array,        # [D, T, G1, E]
    cre_intermediates: jax.Array,  # [num_layers, D, C, E]
    gene_len: jax.Array,           # [D] int32
    cre_len: jax.Array,            # [D] int32
    layers: dict,                  # stacked gene-layer params (models/init)
    slopes: jax.Array | None,
    scale: float,
    num_heads: int,
    head_dim: int,
    tissue_block: int = 6,
) -> jax.Array:
    """Differentiable fused gene modulator. The primal (not under vjp) packs
    and runs the inference-tuned kernel; under ``jax.grad``/``jax.vjp`` the
    forward checkpoints per-layer x/h streams and a recompute Pallas backward
    produces d(gene_stream), d(cre_intermediates) and d(layers). gene_len/
    cre_len get float0 cotangents; ALiBi slopes get zeros (not learned)."""
    packed = pack_gene_layers(layers, num_heads, head_dim)
    # donor_block=1: callers pass tissue_block=pick_tissue_block(t, 1)
    # (TB=6 at T=54), and TB=6 with donor_block>=2 exceeds VMEM at full
    # geometry (pick_tissue_block docstring) — chunk per donor, matching
    # the packed-params inference path's default.
    return fused_gene_modulator_packed(
        gene_stream, cre_intermediates, gene_len, cre_len, packed, slopes,
        layers["ffn_in"]["w"].shape[-1], scale, num_heads, head_dim,
        tissue_block, donor_block=1,
    )


def _mod_diff_fwd(
    gene_stream, cre_intermediates, gene_len, cre_len, layers, slopes,
    scale, num_heads, head_dim, tissue_block,
):
    assert gene_stream.ndim == 4, "the diff path takes donor-leading input"
    d, t, g1, e = gene_stream.shape
    num_layers = cre_intermediates.shape[0]
    ffn = layers["ffn_in"]["w"].shape[-1]
    packed = pack_gene_layers(layers, num_heads, head_dim)
    x, ckv_p, lens, slopes_f, dist, tp, g1p, cp = _prep_inputs(
        gene_stream, cre_intermediates, gene_len, cre_len, packed,
        slopes, num_heads, head_dim, tissue_block,
    )
    outs, xs, hs = [], [], []
    # One donor per save-call: the save streams add two double-buffered
    # output blocks on top of the forward's scratch set, so the donor-folded
    # grid does not fit alongside them.
    for d0 in range(d):
        o, xsave, hsave = _run_fwd_save(
            x[d0 : d0 + 1], ckv_p[d0 : d0 + 1], lens[d0 : d0 + 1],
            packed["slab"], packed["biases"], packed["norms"], dist, slopes_f,
            num_layers, num_heads, head_dim, tissue_block, g1p, scale, ffn,
        )
        outs.append(o)
        xs.append(xsave)
        hs.append(hsave)
    out = outs[0] if d == 1 else jnp.concatenate(outs, axis=0)
    xsave = xs[0] if d == 1 else jnp.concatenate(xs, axis=1)
    hsave = hs[0] if d == 1 else jnp.concatenate(hs, axis=1)
    carrier = jnp.zeros((t, g1, 0), gene_stream.dtype)
    res = (
        xsave, hsave, ckv_p, packed, cre_intermediates, lens, layers,
        slopes, carrier,
    )
    return out[:, :t, :g1], res


def _mod_diff_bwd(scale, num_heads, head_dim, tissue_block, res, dout):
    import numpy as np

    (xsave, hsave, ckv_p, packed, cre_intermediates, lens, layers,
     slopes, carrier) = res
    num_layers, d, tp, g1p, e = xsave.shape
    t, g1, _ = carrier.shape
    c = cre_intermediates.shape[2]
    cp = ckv_p.shape[2]
    hp = num_heads * head_dim
    ffn = layers["ffn_in"]["w"].shape[-1]
    f32 = jnp.float32

    tb = _bwd_tissue_block(tp)
    slab = packed["slab"]
    # Per-phase weight operands re-sliced from the packed slabs:
    #   w0 = wq|wk|wv|wo^T (phase-0 slab cols [0, 4hp))
    #   w1 = cq (phase-0 col 4hp) | cwo^T|wf1|wf2^T (phase-1 cols)
    w0 = slab[0::2][:, :, : 4 * hp]
    w1 = jnp.concatenate(
        [
            slab[0::2][:, :, 4 * hp : 5 * hp],
            slab[1::2][:, :, : hp + ffn + ffn // 2],
        ],
        axis=-1,
    )
    w1_pad = _roundup(w1.shape[-1], 128) - w1.shape[-1]
    if w1_pad:
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, w1_pad)))
    w0_pad = _roundup(w0.shape[-1], 128) - w0.shape[-1]
    if w0_pad:
        w0 = jnp.pad(w0, ((0, 0), (0, 0), (0, w0_pad)))
    dist = jnp.abs(
        jax.lax.broadcasted_iota(jnp.int32, (g1p, g1p), 0)
        - jax.lax.broadcasted_iota(jnp.int32, (g1p, g1p), 1)
    ).astype(f32)
    slopes_f = (
        slopes.astype(f32) if slopes is not None
        else jnp.zeros((num_heads,), f32)
    )

    dnext = jnp.zeros((d, tp, g1p, e), jnp.bfloat16)
    dnext = dnext.at[:, :t, :g1].set(dout.astype(jnp.bfloat16))

    per_layer = [None] * num_layers
    for li in reversed(range(num_layers)):
        dh, dckv_l, dw1_l, db0a, db1_l, dn0a, dn1_l = _run_bwd1(
            li, hsave, ckv_p, dnext, w1, packed["biases"], packed["norms"],
            lens, scale, num_heads, head_dim, tb, ffn,
        )
        dnext, dw0_l, db0b, dn0b = _run_bwd0(
            li, xsave, dnext, dh, w0, packed["biases"], packed["norms"],
            lens, slopes_f, dist, scale, num_heads, head_dim, tb,
        )
        per_layer[li] = (
            dckv_l, dw0_l, dw1_l, db0a + db0b, db1_l, dn0a + dn0b, dn1_l
        )

    stack = lambda k: jnp.stack([per_layer[li][k] for li in range(num_layers)])
    dckv = stack(0)[:, :, :c]                                # [L, D, C, 2hp]
    dw0 = stack(1)[:, :, : 4 * hp]
    dw1 = stack(2)[:, :, : 2 * hp + ffn + ffn // 2]
    dbias0, dbias1, dnorm0, dnorm1 = (stack(k) for k in (3, 4, 5, 6))

    # Cross-K/V cotangents -> d(cre_intermediates) and the wkv grads (the
    # forward computes ckv in XLA at the same boundary — _prep_inputs).
    ckv_w = packed["ckv_w"].astype(f32)                      # [L, E, 2hp]
    d_cre = jnp.einsum(
        "ldcf,lef->ldce", dckv, ckv_w, preferred_element_type=f32
    ).astype(cre_intermediates.dtype)
    d_ckv_w = jnp.einsum(
        "ldce,ldcf->lef", cre_intermediates.astype(f32), dckv,
        preferred_element_type=f32,
    )
    d_ckv_b = dckv.sum(axis=(1, 2))                          # [L, 2hp]

    dlayers = _unpack_mod_grads(
        dw0, dw1, dbias0, dbias1, dnorm0, dnorm1, d_ckv_w, d_ckv_b,
        layers, num_heads, head_dim,
    )
    dx = dnext[:, :t, :g1].astype(carrier.dtype)
    dlen = np.zeros((d,), dtype=jax.dtypes.float0)
    dslopes = None if slopes is None else jnp.zeros_like(slopes)
    return (dx, d_cre, dlen, dlen, dlayers, dslopes)


fused_gene_modulator_diff.defvjp(_mod_diff_fwd, _mod_diff_bwd)
