#!/usr/bin/env python
"""Multi-host genome-wide vcf2exp launcher.

Run one copy per host (e.g. one per TPU-pod worker). Each host initializes
``jax.distributed``, takes its round-robin share of the gene list (DCN-level
data parallelism), runs the streaming sweep with host/device overlap, and
writes its own parquet shards. Reads-in -> genes-out scaling is the sum of
per-host genes/s (there is no cross-host communication in the sweep; the
model itself can additionally shard tensor-parallel inside each host via
parallel.mesh).

Example (single host):
    python scripts/launch_genome_wide.py --vcf donor.vcf.gz \
        --tissues "liver,whole blood" --out /tmp/sweep
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vcf", default=None, help="donor VCF (default: reference genome)")
    ap.add_argument("--tissues", required=True, help="comma-separated tissue names")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--genes", default=None, help="comma-separated subset of gene ids")
    ap.add_argument("--model-class", default="v4_pcg")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--coordinator", default=None, help="host:port for jax.distributed")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="use the synthetic fixture genome + tiny random model")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the model over this host's local devices "
                         "(DP over 'data' x head/FFN TP over 'model' via "
                         "VCFProcessor.use_mesh); without it each forward "
                         "runs single-device")
    ap.add_argument("--partition", default="donor",
                    choices=("donor", "tissue"),
                    help="batch axis sharded over 'data' with --mesh: "
                         "'donor' (default) or 'tissue' (single-donor "
                         "scale-out — the per-tissue gene fan-out and the "
                         "window axes shard instead; pick when the tissue "
                         "list is wide and batches are donor-thin)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); needed on rigs "
                         "whose sitecustomize overrides JAX_PLATFORMS")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("launch")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from variantformer_tpu.api.sweeps import genome_wide_expression
    from variantformer_tpu.parallel.launch import (
        initialize_distributed,
        shard_query_across_hosts,
    )

    topo = initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )

    if args.synthetic:
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
        import jax

        from _common import synthetic_env
        from variantformer_tpu.api.vcfprocessor import VCFProcessor
        from variantformer_tpu.models.init import init_seq2gene

        sources, cfg, extras = synthetic_env(Path(args.out) / "_env")
        proc = VCFProcessor(sources=sources, config=cfg)
        proc.set_params(init_seq2gene(jax.random.key(0), cfg))
        vcf = args.vcf or extras["vcf"]
        tissues = [t for t in args.tissues.split(",") if t in proc.tissue_vocab] or [
            "tissue0"
        ]
    else:
        from variantformer_tpu.api.vcfprocessor import VCFProcessor

        proc = VCFProcessor(model_class=args.model_class)
        proc.load_model()
        vcf = args.vcf
        tissues = args.tissues.split(",")

    if args.mesh:
        # THIS HOST's devices only: in a multi-host run each process sweeps
        # its own gene share, so meshes must not span processes.
        import jax

        from variantformer_tpu.parallel.mesh import make_mesh

        proc.use_mesh(
            make_mesh(devices=jax.local_devices()), partition=args.partition
        )

    gencode = proc.get_genes()
    genes = (
        args.genes.split(",")
        if args.genes
        else [g for g, c in zip(gencode["gene_id"], gencode["chromosome"])
              if c not in ("chrX", "chrY", "chrM")]
    )
    my_genes = shard_query_across_hosts(genes)
    log.info("host %d/%d: %d of %d genes", topo["process_index"],
             topo["process_count"], len(my_genes), len(genes))

    out_dir = Path(args.out) / f"host_{topo['process_index']:03d}"
    t0 = time.time()
    genome_wide_expression(
        proc, vcf, tissues, genes=my_genes,
        batch_size=args.batch_size, out_dir=str(out_dir),
    )
    dt = time.time() - t0
    stats = {
        "host": topo["process_index"],
        "genes": len(my_genes),
        "seconds": round(dt, 2),
        "genes_per_sec": round(len(my_genes) / dt, 4) if dt else None,
    }
    (out_dir / "stats.json").write_text(json.dumps(stats))
    log.info("done: %s", stats)


if __name__ == "__main__":
    main()
