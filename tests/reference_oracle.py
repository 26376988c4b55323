"""Load the reference implementation (read-only at /root/reference) as a
numerical oracle, with its CUDA-only dependencies replaced by dense CPU stubs.

The stubs replicate flash-attn's documented semantics exactly:
  * MHA: packed Wqkv/Wq+Wkv projections, scale 1/sqrt(head_dim), optional
    non-causal ALiBi bias -slope*|i-j|, out_proj; varlen via cu_seqlens.
  * bert_padding.unpad_input/pad_input: gather/scatter by valid-token index.
  * lightning.pytorch.LightningModule: torch Module + save_hyperparameters.

Nothing here ships in the framework — it exists so tests can differentially
verify the JAX implementation against the reference's own forward code.
"""

from __future__ import annotations

import contextlib
import math
import sys
import types
from pathlib import Path

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "seq2gene" / "modules" / "layers.py").exists()


def _alibi_slopes(n: int) -> torch.Tensor:
    def pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(n).is_integer():
        return torch.tensor(pow2(n))
    closest = 2 ** math.floor(math.log2(n))
    return torch.tensor(
        pow2(closest) + _alibi_slopes(2 * closest)[0::2][: n - closest].tolist()
    )


# When True, every _StubMHA call simulates the reference's GPU numerics:
# flash-attn always runs in fp16 when the module is fp32
# (/root/reference/seq2gene/modules/layers.py:103,363 — ``flash_dtype =
# torch.float16 if precision == torch.float32 else precision``), so inputs,
# projection weights, and outputs are quantized to fp16 around an fp32
# softmax accumulation (what the CUDA kernel does internally). Toggle via
# the fp16_attention() context manager; default stays fp32 (ORACLE_AUDIT §5).
FP16_ATTENTION = False


@contextlib.contextmanager
def fp16_attention():
    """Run the oracle with fp16-quantized attention (H100-gold numerics)."""
    global FP16_ATTENTION
    prev = FP16_ATTENTION
    FP16_ATTENTION = True
    try:
        yield
    finally:
        FP16_ATTENTION = prev


class _StubMHA(nn.Module):
    """Dense re-implementation of flash_attn.modules.mha.MHA (inference path)."""

    def __init__(self, embed_dim, num_heads, dropout=0.0, use_flash_attn=True,
                 use_alibi=False, cross_attn=False, **kwargs):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.cross_attn = cross_attn
        self.use_alibi = use_alibi
        if cross_attn:
            self.Wq = nn.Linear(embed_dim, embed_dim)
            self.Wkv = nn.Linear(embed_dim, 2 * embed_dim)
        else:
            self.Wqkv = nn.Linear(embed_dim, 3 * embed_dim)
        self.out_proj = nn.Linear(embed_dim, embed_dim)
        if use_alibi:
            self.register_buffer("alibi_slopes", _alibi_slopes(num_heads), persistent=False)

    def _attend(self, q, k, v):
        # q: [Sq, H, D]; k/v: [Sk, H, D] — one unpadded segment.
        scale = self.head_dim ** -0.5
        scores = torch.einsum("qhd,khd->hqk", q.float(), k.float()) * scale
        if self.use_alibi:
            sq, sk = q.shape[0], k.shape[0]
            dist = (torch.arange(sq)[:, None] - torch.arange(sk)[None, :]).abs().float()
            scores = scores - self.alibi_slopes.float()[:, None, None] * dist
        w = torch.softmax(scores, dim=-1)
        out = torch.einsum("hqk,khd->qhd", w, v.float())
        return out.to(q.dtype)

    def _segments(self, cu, total):
        if cu is None:
            return [(0, total)]
        cu = cu.tolist()
        return list(zip(cu[:-1], cu[1:]))

    def _lin(self, layer, t):
        """Apply a projection, quantizing weights+input to fp16 in fp16 mode
        (non-destructive: the module's fp32 master weights are untouched)."""
        if not FP16_ATTENTION:
            return layer(t)
        return F.linear(t.half(), layer.weight.half(),
                        layer.bias.half() if layer.bias is not None else None)

    def forward(self, x, x_kv=None, cu_seqlens=None, max_seqlen=None,
                cu_seqlens_k=None, max_seqlen_k=None, **kwargs):
        orig_dtype = x.dtype
        if self.cross_attn:
            assert x_kv is not None
            q = self._lin(self.Wq, x).view(*x.shape[:-1], self.num_heads, self.head_dim)
            kv = self._lin(self.Wkv, x_kv).view(*x_kv.shape[:-1], 2, self.num_heads, self.head_dim)
            k, v = kv.unbind(dim=-3)
            if cu_seqlens is not None:
                # unpadded [total, ...]
                segs_q = self._segments(cu_seqlens, x.shape[0])
                segs_k = self._segments(cu_seqlens_k, x_kv.shape[0])
                outs = []
                for (qs, qe), (ks, ke) in zip(segs_q, segs_k):
                    outs.append(self._attend(q[qs:qe], k[ks:ke], v[ks:ke]))
                out = torch.cat(outs, dim=0)
            else:
                outs = [self._attend(q[b], k[b], v[b]) for b in range(x.shape[0])]
                out = torch.stack(outs, dim=0)
        else:
            qkv = self._lin(self.Wqkv, x).view(*x.shape[:-1], 3, self.num_heads, self.head_dim)
            q, k, v = qkv.unbind(dim=-3)
            if cu_seqlens is not None:
                outs = []
                for qs, qe in self._segments(cu_seqlens, x.shape[0]):
                    outs.append(self._attend(q[qs:qe], k[qs:qe], v[qs:qe]))
                out = torch.cat(outs, dim=0)
            else:
                outs = [self._attend(q[b], k[b], v[b]) for b in range(x.shape[0])]
                out = torch.stack(outs, dim=0)
        out = self._lin(self.out_proj, out.reshape(*out.shape[:-2], self.embed_dim))
        return out.to(orig_dtype)


def _unpad_input(hidden_states, attention_mask):
    """attention_mask: True = valid. Returns 5-tuple like flash_attn>=2.6."""
    seqlens = attention_mask.sum(dim=-1, dtype=torch.int32)
    indices = torch.nonzero(attention_mask.flatten(), as_tuple=False).flatten()
    max_seqlen = int(seqlens.max())
    cu_seqlens = F.pad(torch.cumsum(seqlens, dim=0, dtype=torch.int32), (1, 0))
    flat = hidden_states.reshape(-1, *hidden_states.shape[2:])
    return flat[indices], indices, cu_seqlens, max_seqlen, seqlens


def _pad_input(hidden_states, indices, batch, seqlen):
    out = torch.zeros(
        batch * seqlen, *hidden_states.shape[1:], dtype=hidden_states.dtype
    )
    out[indices] = hidden_states
    return out.reshape(batch, seqlen, *hidden_states.shape[1:])


class _LightningModule(nn.Module):
    def save_hyperparameters(self, *args, ignore=(), **kwargs):
        import inspect

        frame = inspect.currentframe().f_back
        hp = {
            k: v
            for k, v in frame.f_locals.items()
            if k not in ("self", "__class__") and k not in ignore
        }
        extra = hp.pop("kwargs", {})
        hp.update(extra)
        self._hparams = types.SimpleNamespace(**hp)

    @property
    def hparams(self):
        return self._hparams

    def log(self, *a, **k):
        pass


_installed = False


def install_reference_stubs():
    """Install stub modules and put /root/reference on sys.path. Idempotent."""
    global _installed
    if _installed:
        return
    flash_attn = types.ModuleType("flash_attn")
    modules_mod = types.ModuleType("flash_attn.modules")
    mha_mod = types.ModuleType("flash_attn.modules.mha")
    mha_mod.MHA = _StubMHA
    bert_padding = types.ModuleType("flash_attn.bert_padding")
    bert_padding.unpad_input = _unpad_input
    bert_padding.pad_input = _pad_input
    flash_attn.modules = modules_mod
    modules_mod.mha = mha_mod
    flash_attn.bert_padding = bert_padding
    sys.modules["flash_attn"] = flash_attn
    sys.modules["flash_attn.modules"] = modules_mod
    sys.modules["flash_attn.modules.mha"] = mha_mod
    sys.modules["flash_attn.bert_padding"] = bert_padding

    lightning = types.ModuleType("lightning")
    lightning_pytorch = types.ModuleType("lightning.pytorch")
    lightning_pytorch.LightningModule = _LightningModule
    lightning.pytorch = lightning_pytorch
    sys.modules["lightning"] = lightning
    sys.modules["lightning.pytorch"] = lightning_pytorch

    pybedtools = types.ModuleType("pybedtools")
    pybedtools.BedTool = object
    sys.modules["pybedtools"] = pybedtools

    duckdb = types.ModuleType("duckdb")
    duckdb.connect = None  # only imported, never used in the tested paths
    sys.modules["duckdb"] = duckdb

    fsspec_ok = True
    try:
        import fsspec  # noqa: F401
    except ImportError:
        fsspec_ok = False
    if not fsspec_ok:
        sys.modules["fsspec"] = types.ModuleType("fsspec")

    sys.path.insert(0, str(REFERENCE_ROOT))
    _installed = True

    # The reference sets torch.set_float32_matmul_precision("medium") at
    # import (seq2reg/model.py:12), which would degrade the CPU oracle's fp32
    # matmuls. Import the reference modules eagerly, then restore full
    # precision so oracle outputs are trustworthy to ~1e-6.
    import seq2gene.model_combined_modulator  # noqa: F401
    import seq2reg.model  # noqa: F401

    torch.set_float32_matmul_precision("highest")
