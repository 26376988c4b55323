#!/usr/bin/env python
"""Compile/fit probe for the donor-folded fused modulator at full geometry.

Tries (tissue_block, donor_block) variants on the real chip and reports
compile success + steady-state time per dispatch, so the shipping defaults
are measured, not guessed (VMEM is the binding constraint: the donor-indexed
scratches + the 34M register-spill allocation compete with the weight slab).

    python scripts/modulator_vmem_probe.py --variants 6x4,4x4,6x2
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="6x4,4x4,6x2")
    ap.add_argument("--t", type=int, default=54)
    ap.add_argument("--g1", type=int, default=201)
    ap.add_argument("--c", type=int, default=384)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()
    import jax
    import jax.numpy as jnp

    from variantformer_tpu.models.init import _context_layer_stack
    from variantformer_tpu.ops.fused_modulator import (
        fused_gene_modulator_packed,
        pack_gene_layers,
    )
    from variantformer_tpu.ops.alibi import alibi_slopes

    E, H, L, FFN = 1536, 32, 25, 2048
    hd = E // H
    layers = _context_layer_stack(jax.random.key(0), L, E, FFN)
    packed = jax.block_until_ready(pack_gene_layers(layers, H, hd))
    slopes = jnp.asarray(alibi_slopes(H))
    rng = np.random.default_rng(0)

    results = {}
    for spec in args.variants.split(","):
        tb, db = (int(x) for x in spec.split("x"))
        d = db
        gene = jnp.asarray(
            rng.normal(size=(d, args.t, args.g1, E)) * 0.05, jnp.bfloat16
        )
        cre = jnp.asarray(
            rng.normal(size=(L, d, args.c, E)) * 0.05, jnp.bfloat16
        )
        glen = jnp.full((d,), args.g1, jnp.int32)
        clen = jnp.full((d,), args.c, jnp.int32)

        def run():
            return fused_gene_modulator_packed(
                gene, cre, glen, clen, packed, slopes, FFN,
                hd ** -0.5, H, hd, tissue_block=tb, donor_block=db,
            )

        def sync(o):
            # the relay's block_until_ready resolves before execution ends;
            # a host transfer is the only reliable sync (see flops_probe)
            return float(np.asarray(jnp.sum(o.astype(jnp.float32))))

        try:
            t0 = time.time()
            checksum = sync(run())
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                checksum = sync(run())
            dt = (time.time() - t0) / args.iters
            results[spec] = {
                "ok": True,
                "compile_s": round(compile_s, 1),
                "ms_per_dispatch": round(dt * 1e3, 1),
                "ms_per_donor": round(dt * 1e3 / d, 1),
                "checksum": checksum,
            }
        except Exception as exc:
            msg = str(exc)
            key = "vmem" if "vmem" in msg else "error"
            results[spec] = {"ok": False, key: msg[:300]}
        print(spec, "->", json.dumps(results[spec])[:200], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
