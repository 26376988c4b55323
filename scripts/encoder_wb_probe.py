#!/usr/bin/env python
"""Sweep the fused encoder's window_block (WB) x ffn_chunks grid on-chip.

Motivation: on the v5e the encoder runs the same time at L=128 and L=200
for a fixed window count — grid-step-bound, not FLOPs-bound — so fewer,
larger window blocks should cut its runtime. The FFN row chunking
(ops/fused_encoder.py) bounds the [rows, F] f32 transient that previously
capped WB at 24 (WB=32 measured 8.5 MB over the VMEM budget).

Each fresh (WB, chunks) pair is a fresh Mosaic compile (minutes over the
remote compiler; persisted in the compilation cache). Results print
incrementally.

    python scripts/encoder_wb_probe.py [--configs 24:1,32:2,40:5,48:6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", default="24:1,12:1,32:2,40:5,48:6",
                    help="comma list of WB:ffn_chunks")
    ap.add_argument("--n", type=int, default=1536, help="window count (d=4 CREs)")
    ap.add_argument("--l", type=int, default=200)
    args = ap.parse_args()

    import numpy as np

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()
    import jax
    import jax.numpy as jnp

    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.ops.alibi import alibi_slopes
    from variantformer_tpu.ops.fused_encoder import fused_window_encoder

    cfg = ModelConfig()
    wcfg = cfg.window_encoder
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    layers = params["cre_tokenizer"]["layers"]
    slopes = jnp.asarray(alibi_slopes(wcfg.num_heads))
    scale = (wcfg.embedding_dim // wcfg.num_heads) ** -0.5
    x = jax.random.normal(
        jax.random.key(1), (args.n, args.l, wcfg.embedding_dim), jnp.bfloat16
    )
    tl = jnp.full((args.n,), args.l, jnp.int32)

    results = {}
    for spec in args.configs.split(","):
        wb, ch = (int(v) for v in spec.split(":"))
        fn = jax.jit(
            lambda x, tl, wb=wb, ch=ch: fused_window_encoder(
                x, tl, layers, slopes, scale, wcfg.num_heads,
                window_block=wb, ffn_chunks=ch,
            )
        )
        t0 = time.time()
        try:
            np.asarray(fn(x, tl))  # compile + warm
        except Exception as exc:  # VMEM OOM etc.
            print(f"WB={wb} chunks={ch}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
            continue
        print(f"WB={wb} chunks={ch}: compiled in {time.time() - t0:.0f}s",
              flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(x, tl))
            ts.append(time.perf_counter() - t0)
        ms = sorted(ts)[2] * 1e3
        results[(wb, ch)] = ms
        print(f"WB={wb} chunks={ch}: {ms:.1f} ms  (N={args.n} L={args.l})",
              flush=True)
    if results:
        best = min(results, key=results.get)
        print(f"best: WB={best[0]} chunks={best[1]} at {results[best]:.1f} ms")


if __name__ == "__main__":
    main()
