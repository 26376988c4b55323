#!/usr/bin/env python
"""Full-geometry training step on-chip: E=1536/L=25/T=54 (VERDICT r4 #4).

All previous training measurements ran at toy geometry (E=512/H=8/L=4/T=12);
the fused modulator VJP's claimed edge "grows with the full stack" was an
extrapolation. This probe compiles and times a REAL full-geometry training
step on the single v5e chip:

  * params bf16 (2.25 GB; 1.207 B params — f32 Adam m+v alone would be
    9 GB and cannot share a 16 GB v5e with params+grads+activations, so the
    optimizer is adafactor, whose factored second moment is ~row+col sums;
    multi-chip Adam needs optimizer-state sharding — recorded in NOTES.md),
  * value_and_grad through the fused stacks' recompute Pallas VJPs
    (impl="fused2") vs the layered XLA backward (impl="xla"),
  * frozen vs trainable tokenizers (the reference trains with the CRE
    tokenizer frozen, model_combined_modulator.py:462-471).

Timing via host transfer of the loss (relay truth). Training MFU numerator:
analytic fwd matmul FLOPs (utils/flops.py) + 2x for the backward over the
non-frozen portion.

    python scripts/full_train_probe.py [--donors 1] [--steps 4]
        [--variants fused2_frozen,fused2_trainable,xla_frozen]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

V5E_BF16_PEAK_TFS = 197.0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--donors", type=int, default=1)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--cres", type=int, default=384)
    ap.add_argument("--tissues", type=int, default=54)
    ap.add_argument(
        "--variants", default="fused2_frozen,fused2_trainable,xla_frozen"
    )
    args = ap.parse_args()

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _example_batch
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.steps import TrainState, seq2gene_loss_fn
    from variantformer_tpu.utils import flops as F

    cfg = ModelConfig()  # the production full-size geometry
    d, c, t = args.donors, args.cres, args.tissues
    g = cfg.dataset.max_chunks
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    batch = _example_batch(
        d=d, c=c, g=g, length=cfg.dataset.max_length, t=t,
        vocab=cfg.window_encoder.vocab_size,
    )
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.poisson(3.0, (d, t)), jnp.float32)
    mask = jnp.ones((d, t), bool)

    # Analytic FLOPs: forward once; backward ~2x forward over the subtree
    # that actually differentiates (frozen tokenizers DCE the window
    # encoder's backward; its forward still runs).
    stages = F.seq2gene_flops(cfg, d=d, c=c, g=g, t=t)
    fwd, enc = stages["total"], stages["window_encoder"]
    flops = {
        "frozen": fwd + 2.0 * (fwd - enc),
        "trainable": 3.0 * fwd,
    }

    tx = optax.adafactor(learning_rate=1e-4)
    results = {}
    for name in filter(None, args.variants.split(",")):
        impl, mode = name.rsplit("_", 1)
        freeze = mode == "frozen"
        run_cfg = cfg
        if impl == "xla":
            # the layered XLA backward at full geometry needs remat of the
            # per-layer activations to fit 16 GB
            import dataclasses

            run_cfg = dataclasses.replace(
                cfg, seq2gene=dataclasses.replace(cfg.seq2gene, remat=True)
            )

        @jax.jit
        def step(state, batch, targets, mask, _cfg=run_cfg, _impl=impl,
                 _freeze=freeze):
            loss, grads = jax.value_and_grad(seq2gene_loss_fn)(
                state.params, batch, targets, mask, _cfg, impl=_impl,
                stop_cre_grads=_freeze, stop_gene_grads=_freeze,
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            return (
                TrainState(
                    optax.apply_updates(state.params, updates),
                    opt_state, state.step + 1,
                ),
                loss,
            )

        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        try:
            t0 = time.time()
            state, loss = step(state, batch, targets, mask)
            float(loss)
            compile_s = time.time() - t0
        except Exception as exc:  # OOM / compile failure is a FINDING
            msg = str(exc).split("\n")[0][:200]
            results[name] = {"error": msg}
            print(f"{name:18s} FAILED: {msg}", flush=True)
            continue
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, loss = step(state, batch, targets, mask)
            float(loss)
            times.append(time.perf_counter() - t0)
        ms = 1e3 * sorted(times)[len(times) // 2]
        tfs = flops[mode] / (ms / 1e3) / 1e12
        results[name] = {
            "step_ms": round(ms, 1),
            "tf_per_s": round(tfs, 1),
            "mfu_pct": round(100.0 * tfs / V5E_BF16_PEAK_TFS, 1),
            "compile_s": round(compile_s, 0),
            "loss": round(float(loss), 4),
        }
        print(f"{name:18s} step {ms:8.1f} ms  {tfs:6.1f} TF/s "
              f"({results[name]['mfu_pct']}% MFU)  compile {compile_s:.0f}s",
              flush=True)

    print(json.dumps({
        "metric": "full_geometry_train_step",
        "geometry": f"E=1536/L=25 T={t} D={d} C={c} G={g} bf16+adafactor",
        "analytic_tflops": {k: round(v / 1e12, 2) for k, v in flops.items()},
        "results": results,
    }))


if __name__ == "__main__":
    main()
