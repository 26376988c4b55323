"""Benchmark: vcf2exp model throughput, genes/sec/chip at 54 tissues.

Runs the full-size flagship model (1536-d, 25 interleaved layers, 63-way
tissue heads) on one chip with a realistic single-gene workload: 384 CRE
windows + 200 gene windows x 200 BPE tokens, fanned out across 54 tissues —
the shape of the reference's headline "one gene, all tissues in ~3-4 min on
H100" configuration (BASELINE.md). Prints ONE JSON line.

baseline: 1 gene / 210 s on H100 (reference notebooks/README.md:17).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()  # same persistent cache the processors/probes use

    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward

    impl = os.environ.get("VFX_BENCH_IMPL", "fused2")
    # Donors per dispatch: genes/s = d / time. Fixed per-call overhead (~40 ms
    # of axon-relay dispatch latency) amortizes across the d genes; measured
    # d=1: 5.63, d=2: 6.29, d=4: 6.73, d=8: 6.74 genes/s — flat past 4.
    d = int(os.environ.get("VFX_BENCH_D", "4"))
    cfg = ModelConfig()
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )  # one fused init call (per-leaf init pays relay latency per leaf)
    batch = _example_batch(
        d=d, c=384, g=cfg.dataset.max_chunks, length=cfg.dataset.max_length,
        t=54, vocab=cfg.window_encoder.vocab_size,
    )

    if impl == "fused2":
        # Pack the gene stack once, as VCFProcessor.set_params does — the
        # fused modulator's weight padding must not run per forward.
        from variantformer_tpu.ops.fused_modulator import pack_gene_layers

        params = dict(params)
        params["gene_layers_packed"] = pack_gene_layers(
            params["gene_layers"], cfg.seq2gene.num_heads,
            cfg.seq2gene.emb_dim // cfg.seq2gene.num_heads,
        )

    fn = jax.jit(lambda p, b: seq2gene_forward(p, b, cfg, impl=impl).pred_expression)
    out = jax.block_until_ready(fn(params, batch))  # compile + warm
    assert out.shape == (d, 54)

    # Sync via host transfer every iteration: block_until_ready is unreliable
    # under the axon relay (returns before execution completes), which makes
    # async timing loops report fantasy numbers.
    import numpy as np

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(params, batch))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    genes_per_sec = d / dt
    baseline = 1.0 / 210.0  # H100 end-to-end, 1 gene x all tissues
    print(
        json.dumps(
            {
                "metric": "genes_per_sec_per_chip_vcf2exp_54tissues",
                "value": round(genes_per_sec, 4),
                "unit": "genes/s",
                "vs_baseline": round(genes_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
