"""Differential test: tests/reference_oracle._StubMHA vs REAL flash-attn.

The CPU stub is the oracle behind every reference-parity test on zero-egress
rigs; this script verifies the stub against the real `flash_attn` wheel on a
GPU machine (docs/ORACLE_AUDIT.md §6). Run it once on any flash-attn-equipped
box before trusting a gold-parity result:

    python scripts/flash_attn_differential.py          # prints one JSON line

Checks (all with identical weights, fp16, 5 seeds):
  1. padded + varlen self-attention, alibi on/off;
  2. cross-attention (Wq/Wkv) with distinct q/k lengths (alibi OFF — the
     shipped model never enables cross-alibi, tests/test_oracle_audit.py);
  3. unpad_input/pad_input round-trip;
  4. ALiBi slope tables for 1..128 heads.

Expected max |diff| ~1e-3 (fp16 rounding). >1e-2 means the stub misreads
flash-attn and oracle-based parity claims need re-derivation.
"""

import json
import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    try:
        import flash_attn  # noqa: F401
        from flash_attn.bert_padding import pad_input, unpad_input
        from flash_attn.modules.mha import MHA
    except ImportError:
        print(json.dumps({"skipped": "flash_attn not installed"}))
        return 0
    if not torch.cuda.is_available():
        print(json.dumps({"skipped": "flash_attn requires CUDA"}))
        return 0

    from tests.reference_oracle import (
        _alibi_slopes,
        _pad_input,
        _unpad_input,
        _StubMHA,
    )

    dev = torch.device("cuda")
    report = {}

    # 4. slope tables
    try:
        from flash_attn.modules.mha import get_alibi_slopes
        slope_err = max(
            float(np.max(np.abs(
                _alibi_slopes(n).numpy() - np.asarray(get_alibi_slopes(n))
            )))
            for n in range(1, 129)
        )
    except ImportError:
        slope_err = None  # older layout; covered implicitly by (1)
    report["slope_table_max_err"] = slope_err

    def clone_weights(stub, real):
        with torch.no_grad():
            for (n, p_s) in stub.named_parameters():
                # stub names: Wqkv/Wq/Wkv/out_proj match flash-attn's MHA
                p_r = dict(real.named_parameters())[n]
                p_r.copy_(p_s.to(p_r.dtype))

    worst = {"self_padded": 0.0, "self_varlen": 0.0, "cross_varlen": 0.0,
             "unpad_roundtrip": 0.0}
    e, h = 64, 4
    for seed in range(5):
        torch.manual_seed(seed)
        for use_alibi in (False, True):
            stub = _StubMHA(e, h, use_alibi=use_alibi).eval()
            real = MHA(e, h, use_flash_attn=True, use_alibi=use_alibi).to(
                dev, torch.float16
            ).eval()
            clone_weights(stub, real)

            b, s = 3, 24
            x = torch.randn(b, s, e, dtype=torch.float16)
            with torch.no_grad():
                out_s = stub(x.float()).half()
                out_r = real(x.to(dev)).cpu()
            worst["self_padded"] = max(
                worst["self_padded"], float((out_s - out_r).abs().max())
            )

            lens = torch.tensor([24, 17, 9], dtype=torch.int32)
            mask = torch.arange(s)[None, :] < lens[:, None]
            flat, idx, cu, mx, _ = _unpad_input(x, mask)
            with torch.no_grad():
                out_s = stub(flat.float(), cu_seqlens=cu, max_seqlen=mx).half()
                out_r = real(
                    flat.to(dev), cu_seqlens=cu.to(dev), max_seqlen=mx
                ).cpu()
            worst["self_varlen"] = max(
                worst["self_varlen"], float((out_s - out_r).abs().max())
            )

        # cross-attention, alibi OFF (shipped configuration)
        stub = _StubMHA(e, h, cross_attn=True).eval()
        real = MHA(e, h, cross_attn=True, use_flash_attn=True).to(
            dev, torch.float16
        ).eval()
        clone_weights(stub, real)
        q = torch.randn(30, e, dtype=torch.float16)     # unpadded totals
        kv = torch.randn(55, e, dtype=torch.float16)
        cu_q = torch.tensor([0, 12, 30], dtype=torch.int32)
        cu_k = torch.tensor([0, 40, 55], dtype=torch.int32)
        with torch.no_grad():
            out_s = stub(
                q.float(), x_kv=kv.float(), cu_seqlens=cu_q, max_seqlen=18,
                cu_seqlens_k=cu_k, max_seqlen_k=40,
            ).half()
            out_r = real(
                q.to(dev), x_kv=kv.to(dev), cu_seqlens=cu_q.to(dev),
                max_seqlen=18, cu_seqlens_k=cu_k.to(dev), max_seqlen_k=40,
            ).cpu()
        worst["cross_varlen"] = max(
            worst["cross_varlen"], float((out_s - out_r).abs().max())
        )

        # 3. unpad/pad round-trip equivalence with the real helpers
        x = torch.randn(2, 11, e)
        lens = torch.tensor([11, 5], dtype=torch.int32)
        mask = torch.arange(11)[None, :] < lens[:, None]
        f_s, i_s, c_s, m_s, _ = _unpad_input(x, mask)
        f_r, i_r, c_r, m_r, _ = unpad_input(x, mask)
        worst["unpad_roundtrip"] = max(
            worst["unpad_roundtrip"],
            float((f_s - f_r).abs().max()),
            float((i_s - i_r).abs().max()),
            float((c_s - c_r).abs().max()),
            float((_pad_input(f_s, i_s, 2, 11) - pad_input(f_r, i_r, 2, 11))
                  .abs().max()),
        )

    report.update(worst)
    report["verdict"] = (
        "OK" if all(v < 1e-2 for v in worst.values()) else "STUB-MISMATCH"
    )
    print(json.dumps(report))
    return 0 if report["verdict"] == "OK" else 1


if __name__ == "__main__":
    sys.exit(main())
