"""Pallas TPU flash-attention kernels.

Replaces the reference's CUDA flash-attn dependency (N1 in SURVEY.md §2.2)
with TPU-native kernels built on online softmax:

  * non-causal self-attention with symmetric ALiBi bias -slope*|i-j|,
  * cross-attention (no bias),
  * donor-shared K/V for the gene stream: cross-attention is position-free,
    so the tissue axis folds into the query rows and K/V stream from HBM
    once per query block.

Kernel structure: the grid is (batch, tissue, head-chunks, q-blocks,
kv-blocks) and each cell processes a chunk of heads with a statically
unrolled loop — one fat cell instead of many tiny ones, which is what
amortizes Mosaic's per-cell overhead at this model's small head dims
(48/64). Masking follows the suffix-padding contract: a per-sample
valid-key count (scalar-prefetched) replaces full masks. Numerics follow
the flash playbook: fp32 softmax statistics and accumulators, bf16 matmul
operands, finite mask value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


def _flash_kernel(
    kv_len_ref,    # [B] int32 (SMEM, scalar-prefetched)
    slopes_ref,    # [H] f32   (SMEM, scalar-prefetched)
    q_ref,         # [1, 1, HC, block_q, D] VMEM
    k_ref,         # [1, HC, block_k, D] VMEM
    v_ref,         # [1, HC, block_k, D] VMEM
    o_ref,         # [1, 1, HC, block_q, D] VMEM
    m_scratch,     # [HC, block_q, NUM_LANES] f32
    l_scratch,     # [HC, block_q, NUM_LANES] f32
    acc_scratch,   # [HC, block_q, D] f32
    *,
    head_chunk: int,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    scale: float,
    use_alibi: bool,
):
    # program_id must be read at kernel top level (the Pallas HLO interpreter
    # cannot substitute it inside pl.when bodies).
    b = pl.program_id(0)
    hc = pl.program_id(2)
    qi = pl.program_id(3)
    ki = pl.program_id(4)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = kv_len_ref[b]

    @pl.when(ki * block_k < kv_len)  # skip blocks entirely past the length
    def _run():
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
        key_mask = col < kv_len
        if use_alibi:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * block_q
            )
            dist = jnp.abs(row - col).astype(jnp.float32)

        for h in range(head_chunk):  # static unroll over the head chunk
            q = q_ref[0, 0, h]                  # [block_q, D]
            k = k_ref[0, h]                     # [block_k, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if use_alibi:
                s = s - slopes_ref[hc * head_chunk + h] * dist
            s = jnp.where(key_mask, s, MASK_VALUE)

            m_prev = m_scratch[h]
            l_prev = l_scratch[h]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scratch[h] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_scratch[h] = m_next

            v = v_ref[0, h]                     # [block_k, D]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scratch[h] = acc_scratch[h] * alpha[:, :1] + pv

    @pl.when(ki == num_k_blocks - 1)
    def _store():
        l = l_scratch[...][:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _flash_kernel_single_kv(
    kv_len_ref, slopes_ref, q_ref, k_ref, v_ref, o_ref,
    *, head_chunk: int, block_q: int, block_k: int, scale: float, use_alibi: bool,
):
    """Fast path when all keys fit one block: exact softmax, no scratch."""
    b = pl.program_id(0)
    hc = pl.program_id(2)
    qi = pl.program_id(3)
    kv_len = kv_len_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    key_mask = col < kv_len
    if use_alibi:
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            + qi * block_q
        )
        dist = jnp.abs(row - col).astype(jnp.float32)
    for h in range(head_chunk):
        q = q_ref[0, 0, h]
        k = k_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if use_alibi:
            s = s - slopes_ref[hc * head_chunk + h] * dist
        s = jnp.where(key_mask, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p * jnp.where(l == 0.0, 1.0, 1.0 / l)
        v = v_ref[0, h]
        o_ref[0, 0, h] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(
    q: jax.Array,        # [B, T, Sq, H, D]
    k: jax.Array,        # [B, Sk, H, D] (shared across T)
    v: jax.Array,        # [B, Sk, H, D]
    kv_len: jax.Array,   # [B] int32
    slopes: jax.Array | None,
    scale: float,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Returns [B, T, Sq, H, D] attention output (same dtype as q)."""
    b, t, sq, h, d = q.shape
    sk = k.shape[1]
    use_alibi = slopes is not None
    if slopes is None:
        slopes = jnp.zeros((h,), jnp.float32)

    # Head-dim padding to a lane-friendly width (zero K-columns don't change
    # scores; zero V-columns are sliced off).
    d_pad = 64 if d <= 64 else 128 if d <= 128 else -(-d // 128) * 128
    qt = _pad_to(q.transpose(0, 1, 3, 2, 4), 4, d_pad)   # [B, T, H, Sq, D]
    kt = _pad_to(k.transpose(0, 2, 1, 3), 3, d_pad)      # [B, H, Sk, D]
    vt = _pad_to(v.transpose(0, 2, 1, 3), 3, d_pad)
    # Single fat block when the sequence fits; otherwise 128-blocks (divides
    # everything after rounding, minimizing padded garbage rows).
    block_q = -(-sq // 16) * 16 if sq <= block_q else 128
    block_k = -(-sk // 128) * 128 if sk <= block_k else 128
    qt = _pad_to(qt, 3, block_q)
    kt = _pad_to(kt, 2, block_k)
    vt = _pad_to(vt, 2, block_k)
    sq_p, sk_p = qt.shape[3], kt.shape[2]
    n_q, n_k = sq_p // block_q, sk_p // block_k

    # Head chunking: fat cells amortize per-cell overhead; bounded by VMEM
    # (scratch ~= HC * block_q * (2*128 + D) * 4 bytes).
    head_chunk = next(c for c in (8, 4, 2, 1) if h % c == 0)
    while head_chunk > 1 and head_chunk * block_q * (2 * NUM_LANES + d_pad) * 4 > 6 * 2**20:
        head_chunk //= 2
    n_h = h // head_chunk

    single_kv = n_k == 1
    if single_kv:
        grid = (b, t, n_h, n_q)
        kernel = functools.partial(
            _flash_kernel_single_kv,
            head_chunk=head_chunk, block_q=block_q, block_k=block_k,
            scale=scale, use_alibi=use_alibi,
        )
        q_idx = lambda b, t, hc, qi, *_: (b, t, hc, qi, 0)
        kv_idx = lambda b, t, hc, qi, *_: (b, hc, 0, 0)
        scratch = []
        semantics = ("parallel", "parallel", "parallel", "parallel")
    else:
        grid = (b, t, n_h, n_q, n_k)
        kernel = functools.partial(
            _flash_kernel,
            head_chunk=head_chunk, block_q=block_q, block_k=block_k,
            num_k_blocks=n_k, scale=scale, use_alibi=use_alibi,
        )
        q_idx = lambda b, t, hc, qi, ki, *_: (b, t, hc, qi, 0)
        kv_idx = lambda b, t, hc, qi, ki, *_: (b, hc, ki, 0)
        scratch = [
            pltpu.VMEM((head_chunk, block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((head_chunk, block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((head_chunk, block_q, d_pad), jnp.float32),
        ]
        semantics = ("parallel", "parallel", "parallel", "parallel", "arbitrary")
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, head_chunk, block_q, d_pad), q_idx),
                pl.BlockSpec((1, head_chunk, block_k, d_pad), kv_idx),
                pl.BlockSpec((1, head_chunk, block_k, d_pad), kv_idx),
            ],
            out_specs=pl.BlockSpec((1, 1, head_chunk, block_q, d_pad), q_idx),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, sq_p, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(kv_len.astype(jnp.int32), slopes.astype(jnp.float32), qt, kt, vt)
    out = out[:, :, :, :sq, :d]                     # strip padding
    return out.transpose(0, 1, 3, 2, 4)             # [B, T, Sq, H, D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _flash_diff(q, k, v, kv_len, slopes, scale):
    return flash_attention(q, k, v, kv_len, slopes, scale)


def _flash_diff_fwd(q, k, v, kv_len, slopes, scale):
    out = flash_attention(q, k, v, kv_len, slopes, scale)
    return out, (q, k, v, kv_len, slopes)


def _flash_diff_bwd(scale, residuals, g):
    """Backward by recomputation through the dense oracle (exact same math;
    trades HBM for a second attention pass — the standard flash trade)."""
    from variantformer_tpu.ops import attention as attn_xla

    q, k, v, kv_len, slopes = residuals

    def ref(q, k, v):
        b, t, sq, h, d = q.shape
        out = attn_xla._attend(
            q.reshape(b * t, sq, h, d),
            jnp.repeat(k, t, axis=0) if t > 1 else k,
            jnp.repeat(v, t, axis=0) if t > 1 else v,
            jnp.repeat(kv_len, t) if t > 1 else kv_len,
            slopes, scale,
        )
        return out.reshape(b, t, sq, h, d)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def self_attention(q, k, v, kv_len, slopes, scale):
    """Drop-in for ops.attention.self_attention: q/k/v [B, S, H, D].
    Differentiable: backward recomputes through the XLA oracle."""
    out = _flash_diff(q[:, None], k, v, kv_len, slopes, scale)
    return out[:, 0]


def cross_attention(q, k, v, q_len, kv_len, scale):
    """Drop-in for ops.attention.cross_attention: q/k/v [B, S*, H, D]."""
    del q_len
    out = _flash_diff(q[:, None], k, v, kv_len, None, scale)
    return out[:, 0]


def cross_attention_shared_kv(q, k, v, kv_len, scale):
    """Gene-stream form: q [B, T, Sq, H, D]; k/v [B, Sk, H, D] shared over T.

    Cross-attention has no positional bias, so query rows are position-free:
    fold the tissue axis into the query sequence and run one plain flash
    cross-attention — K/V then stream from HBM once per query block instead
    of once per (tissue, q block)."""
    b, t, sq, h, d = q.shape
    out = _flash_diff(q.reshape(b, 1, t * sq, h, d), k, v, kv_len, None, scale)
    return out.reshape(b, t, sq, h, d)
