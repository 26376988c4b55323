"""Measure the fused donor-DP path UNDER THE MESH on the real chip.

Round 2's scale-out forfeited the fused kernels (use_mesh downgraded to
layered XLA, ~2.6 genes/s-class). Round 3 keeps them via shard_map donor-DP
(parallel/mesh.donor_dp_forward). Only one real chip is reachable on this
rig, so the scaling *fraction* is certified by the 8-device CPU-mesh parity
tests; THIS probe certifies the other half of the claim on hardware: the
meshed per-chip rate equals the single-chip fused rate (the shard_map
wrapper adds no measurable overhead — the per-device program is the same
fused kernel launch).

Usage: python scripts/meshed_fused_probe.py  [VFX_BENCH_D=4]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, params, batch, d):
    import numpy as np

    out = fn(params, batch)  # compile + warm
    np.asarray(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(params, batch))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return d / dt, dt


def main():
    import jax

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()

    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward
    from variantformer_tpu.ops.fused_modulator import pack_gene_layers
    from variantformer_tpu.parallel import mesh as pmesh

    d = int(os.environ.get("VFX_BENCH_D", "4"))
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
        d=d, c=384, g=cfg.dataset.max_chunks, length=cfg.dataset.max_length,
        t=54, vocab=cfg.window_encoder.vocab_size,
    )

    plain = jax.jit(
        lambda p, b: seq2gene_forward(p, b, cfg, impl="fused2").pred_expression
    )
    rate0, dt0 = measure(plain, params, batch, d)
    print(f"single-chip fused2 (no mesh): {rate0:.4f} genes/s  ({dt0*1e3:.1f} ms)")

    m = pmesh.make_mesh(devices=jax.devices()[:1])
    repl = pmesh.replicate_params(params, m)
    b = pmesh.shard_batch_donor_all(batch, m)
    meshed_full = pmesh.donor_dp_forward(cfg, m, b, impl="fused2")

    def meshed(p, bb):
        return meshed_full(p, bb).pred_expression

    rate1, dt1 = measure(meshed, repl, b, d)
    print(f"meshed fused2 (1-device donor-DP shard_map): {rate1:.4f} genes/s "
          f"({dt1*1e3:.1f} ms)")

    # Tissue partition (single-donor scale-out): same certification — the
    # 1-device meshed rate must match the single-chip fused rate, so the
    # 8-device CPU-parity fraction describes scale-out of the FAST rate.
    batch_t = _example_batch(
        d=1, c=384, g=cfg.dataset.max_chunks, length=cfg.dataset.max_length,
        t=54, vocab=cfg.window_encoder.vocab_size,
    )
    rate2, dt2 = measure(plain, params, batch_t, 1)
    print(f"single-chip fused2 d=1 (tissue baseline): {rate2:.4f} genes/s "
          f"({dt2*1e3:.1f} ms)")
    padded_t, _ = pmesh.pad_tissue_axis(batch_t, m, multiple=1)
    bt = pmesh.shard_batch_tissue_all(padded_t, m)
    tissue_full = pmesh.tissue_dp_forward(cfg, m, bt, impl="fused2")

    def meshed_t(p, bb):
        return tissue_full(p, bb).pred_expression

    rate3, dt3 = measure(meshed_t, repl, bt, 1)
    print(f"meshed fused2 (1-device tissue-DP shard_map): {rate3:.4f} genes/s "
          f"({dt3*1e3:.1f} ms)")

    print(json.dumps({
        "metric": "meshed_fused_rate_fraction_of_single_chip",
        "single_chip_genes_per_s": round(rate0, 4),
        "meshed_genes_per_s": round(rate1, 4),
        "fraction": round(rate1 / rate0, 4),
        "d": d,
        "tissue_partition": {
            "single_chip_d1_genes_per_s": round(rate2, 4),
            "meshed_genes_per_s": round(rate3, 4),
            "fraction": round(rate3 / rate2, 4),
        },
    }))


if __name__ == "__main__":
    main()
