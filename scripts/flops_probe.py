#!/usr/bin/env python
"""Attention / model FLOPs-utilization probe (BASELINE.json metric).

Measures achieved TFLOP/s for the model's attention stages and the full
forward against the chip's bf16 peak, using host-transfer syncing (the relay's
ready events are unreliable). Emits a JSON report.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_PEAK_TFLOPS = 197.0


def _timed(fn, *args, reps=20, inner=None):
    import jax
    import numpy as np

    if inner is None:
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]
    return inner


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="write JSON here (else stdout)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()

    from variantformer_tpu.ops import attention as attn_xla
    from variantformer_tpu.ops import flash
    from variantformer_tpu.ops.alibi import alibi_slopes

    report = {"device": str(jax.devices()[0]), "peak_tflops_bf16": V5E_BF16_PEAK_TFLOPS}

    REPS = 20

    def chain_time(f, q, k, v, kv_len, slopes, scale):
        @jax.jit
        def g(q, k, v, kv_len, slopes):
            def body(i, q):
                out = f(q, k, v, kv_len, slopes, scale)
                return q + 0.0 * out
            return jax.lax.fori_loop(0, REPS, body, q)

        def sync(r):  # transfer a tiny slice, not the whole array
            return np.asarray(r[0, 0, 0, 0])

        sync(g(q, k, v, kv_len, slopes))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(g(q, k, v, kv_len, slopes))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1] / REPS

    stages = {
        "encoder_self_attention": (584, 200, 8, 64, True),
        "cre_self_attention": (8, 512, 32, 48, True),
        "gene_self_attention": (54, 208, 32, 48, True),
    }
    for name, (b, s, h, d, alibi) in stages.items():
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = (jax.random.normal(ks[i], (b, s, h, d), jnp.bfloat16) for i in range(3))
        kv_len = jnp.full((b,), s, jnp.int32)
        slopes = jnp.asarray(alibi_slopes(h)) if alibi else None
        scale = d ** -0.5
        flops = 4 * b * h * s * s * d
        entry = {}
        for impl_name, f in (("xla", attn_xla.self_attention),
                             ("pallas", flash.self_attention)):
            dt = chain_time(f, q, k, v, kv_len, slopes, scale)
            entry[impl_name] = {
                "ms": round(dt * 1e3, 3),
                "tflops_per_s": round(flops / dt / 1e12, 2),
                "pct_of_peak": round(100 * flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS, 1),
            }
        report[name] = entry

    # full model
    from __graft_entry__ import _example_batch
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward

    cfg = ModelConfig()
    params = init_seq2gene(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    batch = _example_batch(d=1, c=384, g=200, length=200, t=54, vocab=500)
    fn = jax.jit(
        lambda p, b: seq2gene_forward(p, b, cfg, impl="fused").pred_expression
    )
    np.asarray(fn(params, batch))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(params, batch))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1]
    # FLOPs estimate: window encoders (~5.3 TF) + cre stack (~0.44) +
    # per-tissue gene stack (~10.3 at T=54) — see NOTES.md.
    model_flops = 15.6e12
    report["full_model_vcf2exp_54t"] = {
        "ms": round(dt * 1e3, 1),
        "est_tflops_per_s": round(model_flops / dt / 1e12, 1),
        "pct_of_peak": round(100 * model_flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS, 1),
    }

    text = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
