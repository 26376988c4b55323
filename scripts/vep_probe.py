#!/usr/bin/env python
"""On-chip VEP throughput probe: variants/s at variants_per_dispatch k.

Measures the full VariantProcessor.predict path (SAMPLE mode: host builds
ref/het/hom consensus triples, device runs D=3k per dispatch) at production
scale — a 310 kb gene window, 350 CREs, full-size model, 54 tissues — for
each requested k. Each k is a distinct device shape (one-time compile into
the persistent cache; ~15 min cold on the remote compiler).

    python scripts/vep_probe.py [--variants 8] [--ks 1,4]
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
import pandas as pd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", type=int, default=8)
    ap.add_argument("--ks", default="1,4")
    ap.add_argument("--tissues", type=int, default=54)
    ap.add_argument("--root", default="/tmp/vfx_vep_probe")
    args = ap.parse_args()

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from sustained_probe import build_env
    from variantformer_tpu.api.variantprocessor import VariantProcessor
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.utils.fasta import FastaReader

    rng = np.random.default_rng(0)
    sources, vcf = build_env(args.root, 1, rng)
    cfg = ModelConfig()
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    tissues = ",".join(f"tissue{i}" for i in range(args.tissues))

    # SNVs spread across the gene's CRE-rich span; all pair to GENE000.1.
    fa = FastaReader(sources.fasta_path)
    flip = {"A": "G", "C": "T", "G": "A", "T": "C"}
    rows = []
    for pos in np.linspace(12_000, 290_000, args.variants).astype(int):
        ref = fa.fetch("chr1", pos - 1, pos).upper()
        if ref not in "ACGT":  # ambiguity codes in real FASTA (e.g. N)
            continue
        rows.append(
            {"chrom": "chr1", "pos": int(pos), "ref": ref,
             "alt": flip[ref], "tissue": tissues}
        )
    var_df = pd.DataFrame(rows)

    results = {}
    for k in (int(x) for x in args.ks.split(",")):
        vp = VariantProcessor(sources=sources, config=cfg)
        vp.set_params(params)
        out_dir = os.path.join(args.root, f"out_k{k}")
        # Warm (compile) on a FULL pass, then time a second full pass: a
        # prefix warm can silently skip the compile when its variants fall
        # outside the gene's CRE context (no pair -> no dispatch), leaving
        # the ~8 min compile inside the timed run (measured: 508 s for 12
        # variants that run at ~1 s/variant warm).
        for sub, tag in ((var_df, "warm"), (var_df, "run")):
            for f in Path(out_dir).glob("*.parquet") if Path(out_dir).exists() else []:
                f.unlink()
            t0 = time.time()
            df = vp.predict(
                sub, out_dir, vcf_path=vcf, sample_name="S1",
                variants_per_dispatch=k,
                # one canonical CRE shape: without it, variants near window
                # edges fall into smaller 64-step c-buckets and each bucket
                # is a fresh ~8 min remote compile (measured) inside the run
                canonical_cres=384,
            )
            dt = time.time() - t0
            if tag == "warm":
                print(f"k={k} warm (compile) {dt:.1f}s", flush=True)
        rate = len(var_df) / dt
        stats = dict(vp.vep_stats)
        hits, misses = stats.get("ref_hits", 0), stats.get("ref_misses", 0)
        results[f"k={k}"] = {
            "variants_per_s": round(rate, 3),
            "s_per_variant": round(dt / len(var_df), 3),
            "rows": len(df),
            "ref_reuse_pct": round(100.0 * hits / (hits + misses), 1)
            if hits + misses else None,
            "stages_s": {
                s: round(stats.get(s, 0.0), 2)
                for s in ("build_s", "pack_s", "dispatch_s", "fetch_s")
            },
            "dispatches": stats.get("dispatches", 0),
        }
        print(f"k={k}: {len(var_df)} variants in {dt:.1f}s = "
              f"{rate:.3f} variants/s  stats={results[f'k={k}']}", flush=True)

    print(json.dumps({
        "metric": "vep_variants_per_s_full_size_54tissues",
        "results": results,
    }))


if __name__ == "__main__":
    main()
