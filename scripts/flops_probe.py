#!/usr/bin/env python
"""Model FLOPs-utilization probe (BASELINE.json metric).

Times the full vcf2exp forward at released geometry for each impl
(xla / fused / fused2) with host-transfer syncing (the relay's ready events
are unreliable), and computes MFU from the analytic matmul-only FLOPs
counter (utils/flops.py, validated against CPU XLA cost analysis in
tests/test_aux_components.py). The TPU backend's cost_analysis() is NOT
used: it measured ~13x low after fusion on this rig and cannot see inside
Pallas custom calls. Emits flops_report.json.

Round-2 note: the per-layer Pallas flash-attention path was retired (XLA
won at every per-layer shape; see NOTES.md). Pallas wins come from the
fused whole-stack kernels, which impl=fused/fused2 measure.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="write JSON here (else stdout)")
    ap.add_argument("--impls", default="fused2,fused,xla")
    ap.add_argument("--d", type=int, default=1,
                    help="donors per dispatch (bench.py's VFX_BENCH_D)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()

    from __graft_entry__ import _example_batch
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward
    from variantformer_tpu.ops.fused_encoder import fused_window_encoder  # noqa: F401
    from variantformer_tpu.ops.fused_modulator import pack_gene_layers

    report = {
        "device": str(jax.devices()[0]),
        "peak_tflops_bf16": V5E_BF16_PEAK_TFLOPS,
        "geometry": "E=1536 H=32 L=25 T=54, 384 CREs + 200 gene windows x 200 tok",
    }

    cfg = ModelConfig()
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    params = dict(params)
    params["gene_layers_packed"] = pack_gene_layers(
        params["gene_layers"], cfg.seq2gene.num_heads,
        cfg.seq2gene.emb_dim // cfg.seq2gene.num_heads,
    )
    batch = _example_batch(
        d=args.d, c=384, g=cfg.dataset.max_chunks, length=cfg.dataset.max_length,
        t=54, vocab=cfg.window_encoder.vocab_size,
    )
    report["donors_per_dispatch"] = args.d

    # MFU numerator: analytic matmul-only model FLOPs (utils/flops.py,
    # CPU-cost-analysis-validated in tests). The TPU backend's
    # compiled.cost_analysis() measured ~13x low after fusion on this rig
    # and cannot see inside the Pallas custom calls — do not use it.
    from variantformer_tpu.utils.flops import seq2gene_flops

    breakdown = seq2gene_flops(cfg, d=args.d, c=384, g=cfg.dataset.max_chunks, t=54)
    model_flops = breakdown["total"]
    report["model_flops_analytic"] = {
        k: round(v / 1e12, 3) for k, v in breakdown.items()
    }

    for impl in args.impls.split(","):
        fn = jax.jit(
            lambda p, b, impl=impl: seq2gene_forward(
                p, b, cfg, impl=impl
            ).pred_expression
        )
        np.asarray(fn(params, batch))  # warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(params, batch))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2]
        entry = {
            "ms": round(dt * 1e3, 1),
            "genes_per_s": round(args.d / dt, 3),
            "tflops_per_s": round(model_flops / dt / 1e12, 1),
            "mfu_pct": round(
                100 * model_flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS, 1
            ),
        }
        suffix = "" if args.d == 1 else f"_d{args.d}"
        report[f"full_model_{impl}{suffix}"] = entry
        print(impl, entry, flush=True)

    if args.out and Path(args.out).exists():
        # merge: keep other-d entries from previous runs
        merged = json.loads(Path(args.out).read_text())
        merged.update(report)
        report = merged
    text = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
