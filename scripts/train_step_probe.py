#!/usr/bin/env python
"""On-chip training-step probe: what the frozen-tokenizer contract buys.

The reference always trains seq2gene with the CRE tokenizer frozen
(model_combined_modulator.py:462-471); our training step exposes that as
``freeze_tokenizers``, which (a) lets XLA dead-code-eliminate the window
encoder's backward (~1/3 of forward FLOPs) and (b) makes the fused-encoder
Pallas kernel legal in the training forward (``impl="fused"``). This probe
measures all three step variants at a mid-size geometry on the real chip:

  * xla / trainable tokenizers (the naive step)
  * xla / frozen tokenizers (encoder backward DCE'd)
  * fused / frozen tokenizers (fused-encoder forward + DCE'd backward)
  * fused / trainable gene tokenizer (fused-encoder forward + the recompute
    Pallas backward via its custom VJP — the non-frozen training path)

Timing is via host transfer of the loss (block_until_ready is unreliable
under the axon relay). Each variant is a distinct HLO -> one-time compile
(persistent cache applies).

    python scripts/train_step_probe.py [--steps 6] [--donors 2]
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--donors", type=int, default=2)
    ap.add_argument("--cres", type=int, default=64)
    ap.add_argument("--genes", type=int, default=50)
    ap.add_argument("--tissues", type=int, default=12)
    ap.add_argument(
        "--variants", default="",
        help="comma list to run (default: all); e.g. fused2_frozen",
    )
    args = ap.parse_args()

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from variantformer_tpu.config import (
        ModelConfig,
        Seq2GeneConfig,
        WindowEncoderConfig,
    )
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.optimizer import make_optimizer
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    # Mid-size geometry: the E=512/H=8/L=4 family already hardware-validated
    # for the fused kernels; big enough that encoder FLOPs matter, small
    # enough that each variant's compile stays in minutes.
    cfg = ModelConfig(
        window_encoder=WindowEncoderConfig(
            embedding_dim=512, num_heads=8, num_layers=4, ffn_hidden_dim=2048,
        ),
        seq2gene=Seq2GeneConfig(
            emb_dim=512, gene_emb_dim=512, token_dim=512, num_heads=8,
            num_layers=4, ffn_hidden_dim=2048, num_tissues=args.tissues,
        ),
    )
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jnp.float32))(
        jax.random.key(0)
    )
    batch = _example_batch(
        d=args.donors, c=args.cres, g=args.genes,
        length=cfg.dataset.max_length, t=args.tissues,
        vocab=cfg.window_encoder.vocab_size,
    )
    rng = np.random.default_rng(0)
    targets = jnp.asarray(
        rng.poisson(3.0, (args.donors, args.tissues)), jnp.float32
    )
    mask = jnp.ones((args.donors, args.tissues), bool)

    results = {}
    wanted = set(filter(None, args.variants.split(",")))
    for name, impl, freeze in (
        ("xla_trainable", "xla", False),
        ("xla_frozen", "xla", True),
        ("fused_frozen", "fused", True),
        ("fused_trainable", "fused", False),
        # fused2: the gene stack ALSO runs fused, forward via the modulator
        # kernel and backward via its recompute Pallas VJP
        # (ops/fused_modulator).
        ("fused2_frozen", "fused2", True),
        ("fused2_trainable", "fused2", False),
    ):
        if wanted and name not in wanted:
            continue
        tx = make_optimizer(params, train_gene_tokenizer=not freeze)
        step = make_seq2gene_train_step(
            cfg, tx, impl=impl, freeze_tokenizers=freeze,
            train_gene_tokenizer=not freeze,
        )
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        t0 = time.time()
        state, loss = step(state, batch, targets, mask)
        float(loss)  # host transfer = hard sync
        compile_s = time.time() - t0
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, loss = step(state, batch, targets, mask)
            float(loss)
            times.append(time.perf_counter() - t0)
        ms = 1e3 * sorted(times)[len(times) // 2]
        results[name] = round(ms, 1)
        print(
            f"{name:14s} step {ms:7.1f} ms  (compile {compile_s:.0f}s, "
            f"loss {float(loss):.4f})",
            flush=True,
        )

    out = {
        "geometry": f"E=512/H=8/L=4 T={args.tissues} D={args.donors} "
                    f"C={args.cres} G={args.genes}",
        "step_ms": results,
    }
    if "xla_trainable" in results:
        base = results["xla_trainable"]
        for name, ms in results.items():
            if name != "xla_trainable":
                out[f"{name}_speedup"] = round(base / ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
