"""Pallas TPU flash-attention kernels.

Replaces the reference's CUDA flash-attn dependency (N1 in SURVEY.md §2.2)
with TPU-native kernels built on online softmax:

  * non-causal self-attention with symmetric ALiBi bias -slope*|i-j|,
  * cross-attention (no bias),
  * donor-shared K/V: a tissue axis T on the query side whose K/V BlockSpec
    index map ignores T, so the gene stream's cross-attention reads each
    donor's CRE keys once from HBM instead of materializing them per tissue.

Masking follows the suffix-padding contract: a per-sample valid-key count
``kv_len`` (scalar-prefetched to SMEM) replaces full masks; query rows beyond
a sample's length produce garbage that callers never read. Numerics follow
the flash-attention playbook: fp32 softmax statistics and accumulator, bf16
matmul operands, mask value -0.7*f32_max (never -inf).
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
    q_ref,         # [1, 1, 1, block_q, D] VMEM
    k_ref,         # [1, 1, block_k, D] VMEM
    v_ref,         # [1, 1, block_k, D] VMEM
    o_ref,         # [1, 1, 1, block_q, D] VMEM
    m_scratch,     # [block_q, NUM_LANES] f32
    l_scratch,     # [block_q, NUM_LANES] f32
    acc_scratch,   # [block_q, D] f32
    *,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    scale: float,
    use_alibi: bool,
):
    # program_id must be read at kernel top level (not inside pl.when bodies:
    # the Pallas HLO interpreter can't substitute it inside cond branches).
    b = pl.program_id(0)
    h = pl.program_id(2)
    qi = pl.program_id(3)
    ki = pl.program_id(4)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = kv_len_ref[b]

    # Skip KV blocks entirely past this sample's length.
    @pl.when(ki * block_k < kv_len)
    def _run():
        q = q_ref[0, 0, 0]                      # [block_q, D]
        k = k_ref[0, 0]                         # [block_k, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                       # [block_q, block_k]
        s = s * scale

        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
        if use_alibi:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * block_q
            )
            dist = jnp.abs(row - col).astype(jnp.float32)
            s = s - slopes_ref[h] * dist
        s = jnp.where(col < kv_len, s, MASK_VALUE)

        m_prev = m_scratch[...]                 # [block_q, LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1)[:, None]    # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)    # broadcast -> [block_q, LANES]
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])          # [block_q, block_k]
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1)[:, None]
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]                         # [block_k, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    @pl.when(ki == num_k_blocks - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


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
    block_q: int = 128,
    block_k: int = 128,
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
    block_q = min(block_q, -(-sq // 16) * 16)
    qt = _pad_to(qt, 3, block_q)
    kt = _pad_to(kt, 2, block_k)
    vt = _pad_to(vt, 2, block_k)
    sq_p, sk_p = qt.shape[3], kt.shape[2]
    n_q, n_k = sq_p // block_q, sk_p // block_k

    grid = (b, t, h, n_q, n_k)
    kernel = functools.partial(
        _flash_kernel,
        block_q=block_q,
        block_k=block_k,
        num_k_blocks=n_k,
        scale=scale,
        use_alibi=use_alibi,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, block_q, d_pad),
                    lambda b, t, h, qi, ki, *_: (b, t, h, qi, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d_pad),
                    lambda b, t, h, qi, ki, *_: (b, h, ki, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d_pad),
                    lambda b, t, h, qi, ki, *_: (b, h, ki, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, block_q, d_pad),
                lambda b, t, h, qi, ki, *_: (b, t, h, qi, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_q, d_pad), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, sq_p, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "parallel", "arbitrary"
            ),
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(kv_len.astype(jnp.int32), slopes.astype(jnp.float32), qt, kt, vt)
    out = out[:, :, :, :sq, :d]                     # strip padding
    return out.transpose(0, 1, 3, 2, 4)             # [B, T, Sq, H, D]


def self_attention(q, k, v, kv_len, slopes, scale):
    """Drop-in for ops.attention.self_attention: q/k/v [B, S, H, D]."""
    out = flash_attention(q[:, None], k, v, kv_len, slopes, scale)
    return out[:, 0]


def cross_attention(q, k, v, q_len, kv_len, scale):
    """Drop-in for ops.attention.cross_attention: q/k/v [B, S*, H, D]."""
    del q_len
    out = flash_attention(q[:, None], k, v, kv_len, None, scale)
    return out[:, 0]


def cross_attention_shared_kv(q, k, v, kv_len, scale):
    """Gene-stream form: q [B, T, Sq, H, D]; k/v [B, Sk, H, D] shared over T."""
    return flash_attention(q, k, v, kv_len, None, scale)
