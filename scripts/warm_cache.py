#!/usr/bin/env python
"""Pre-compile the standard model shapes into the persistent JAX cache.

First compiles of the full-size model take minutes (more through remote
compile tunnels); run this once per machine so production calls and the
benchmark are warm. Compiles the bench/entry shape plus the common bucket
grid (CRE slots x gene slots x tissue counts).
"""

from __future__ import annotations

import argparse
import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--impl", default="fused2")
    ap.add_argument("--cre-buckets", default="256,384,512")
    ap.add_argument("--gene-buckets", default="200")
    ap.add_argument("--tissues", default="54")
    ap.add_argument("--donors", default="1,4")
    ap.add_argument(
        "--style", default="both", choices=("both", "bench", "processor"),
        help="bench = pred_expression-only jit (bench.py/__graft_entry__); "
        "processor = full Seq2GeneOutput jit (VCFProcessor._forward). The "
        "two are different HLO, hence different cache entries.",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from variantformer_tpu.utils.jax_setup import enable_cache

    cache = enable_cache()
    print(f"compilation cache: {cache}")

    from __graft_entry__ import _example_batch
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward

    cfg = ModelConfig()
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    if args.impl == "fused2":
        # Mirror bench.py / VCFProcessor.set_params exactly: the packed-
        # operand forward is a different HLO than inline packing, and only
        # the packed one is the production/bench cache entry.
        from variantformer_tpu.ops.fused_modulator import pack_gene_layers

        params = dict(params)
        params["gene_layers_packed"] = pack_gene_layers(
            params["gene_layers"], cfg.seq2gene.num_heads,
            cfg.seq2gene.emb_dim // cfg.seq2gene.num_heads,
        )
    styles = []
    if args.style in ("both", "bench"):
        styles.append(
            ("bench", jax.jit(
                lambda p, b: seq2gene_forward(p, b, cfg, impl=args.impl).pred_expression
            ))
        )
    if args.style in ("both", "processor"):
        styles.append(
            ("processor", jax.jit(
                lambda p, b: seq2gene_forward(p, b, cfg, impl=args.impl)
            ))
        )
    combos = list(itertools.product(
        [int(x) for x in args.donors.split(",")],
        [int(x) for x in args.cre_buckets.split(",")],
        [int(x) for x in args.gene_buckets.split(",")],
        [int(x) for x in args.tissues.split(",")],
    ))
    import numpy as np

    for style, fn in styles:
        for d, c, g, t in combos:
            batch = _example_batch(d=d, c=c, g=g, length=cfg.dataset.max_length,
                                   t=t, vocab=cfg.window_encoder.vocab_size)
            t0 = time.time()
            out = fn(params, batch)
            np.asarray(out if style == "bench" else out.pred_expression)
            print(f"compiled [{style}] d={d} c={c} g={g} t={t}: "
                  f"{time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
