#!/usr/bin/env python
"""Sustained host+device throughput probe: genome-wide sweep at full scale.

The headline bench (bench.py) times the device forward alone; this probe
measures the honest end-to-end rate — host sample building (consensus +
BPE + packing, ThreadPoolExecutor workers) overlapped with device compute
via api/sweeps.genome_wide_expression — on a full-production-scale
synthetic workload: N genes, each with a 300 kb window (the max_chunks=200
cap), ~350 CREs, and a donor VCF, through the full-size model at 54
tissues. Shapes match bench.py's buckets (d=4 dispatch groups, c=384,
g=200); the device HLO differs from bench.py's pred-only jit (the
processors jit the full Seq2GeneOutput), so warm both via warm_cache.py.

    python scripts/sustained_probe.py [--genes 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def build_env(root, n_genes: int, rng):
    """4 Mb-per-gene synthetic genome with production-scale gene windows."""
    from variantformer_tpu.api.vcfprocessor import DataSources
    from variantformer_tpu.utils.assets import resolve_vocab_path
    from variantformer_tpu.utils.bgzf import write_bgzf

    os.makedirs(root, exist_ok=True)
    # Clear indexes from a previous run at a different --genes: the fasta is
    # rewritten below but a stale .fai would clamp fetches at the old length.
    for stale in ("genome.fa.fai", "genome.fa.gzi", "donor.vcf.gz.gzi"):
        try:
            os.unlink(os.path.join(root, stale))
        except FileNotFoundError:
            pass
    span = 340_000
    chr_len = n_genes * span + 20_000
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), chr_len)
    s = seq.tobytes().decode()
    fasta = os.path.join(root, "genome.fa")
    with open(fasta, "w") as fh:
        fh.write(">chr1 sustained\n")
        for i in range(0, chr_len, 10_000):
            fh.write(s[i : i + 10_000] + "\n")

    genes, cre_maps = [], {}
    classes = ["PLS", "pELS", "dELS", "PLS,CTCF-bound", "dELS,CTCF-bound"]
    vcf_lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
    ]
    flip = {"A": "G", "C": "T", "G": "A", "T": "C"}
    for gi in range(n_genes):
        start = gi * span + 10_000
        gene_id = f"GENE{gi:03d}.1"
        genes.append(
            {"gene_id": gene_id, "gene_name": f"G{gi}", "chromosome": "chr1",
             "start": start, "end": start + 310_000, "strand": "+" if gi % 2 else "-"}
        )
        cre_starts = np.sort(
            rng.choice(np.arange(start - 900, start + 295_000, 60), 350, replace=False)
        )
        cre_maps[gene_id] = pd.DataFrame(
            {"chromosome": "chr1", "start_cre": cre_starts,
             "end_cre": cre_starts + rng.integers(120, 280, 350),
             "cre_name": rng.choice(classes, 350)}
        )
        for pos in np.sort(rng.choice(np.arange(start, start + 290_000), 150, replace=False)):
            ref = s[pos - 1]
            vcf_lines.append(
                f"chr1\t{pos}\t.\t{ref}\t{flip[ref]}\t.\tPASS\t.\tGT\t"
                f"{'0|1' if pos % 3 else '1|1'}"
            )
    pd.DataFrame(genes).to_csv(os.path.join(root, "gencode.csv"), index=False)
    vcf = os.path.join(root, "donor.vcf.gz")
    write_bgzf(vcf, ("\n".join(vcf_lines) + "\n").encode())
    tissue_vocab = os.path.join(root, "tissues.yaml")
    with open(tissue_vocab, "w") as fh:
        fh.write("".join(f"tissue{i}: {i}\n" for i in range(63)))
    sources = DataSources(
        fasta_path=fasta,
        gencode_path=os.path.join(root, "gencode.csv"),
        bpe_vocab_path=resolve_vocab_path("bpe_vocabulary_500.json"),
        tissue_vocab_path=tissue_vocab,
        cre_map_provider=lambda g: cre_maps[g],
    )
    return sources, vcf


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--genes", type=int, default=12)
    ap.add_argument("--tissues", type=int, default=54)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument(
        "--out-dir", default=None,
        help="stream prediction parquet shards here and keep them (the "
             "genome-wide demonstration artifact; default: in-memory frame)",
    )
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)  # surface the StageTimer summary

    import jax

    from variantformer_tpu.api.sweeps import genome_wide_expression
    from variantformer_tpu.api.vcfprocessor import VCFProcessor
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()
    rng = np.random.default_rng(0)
    t0 = time.time()
    sources, vcf = build_env("/tmp/vfx_sustained", args.genes, rng)
    print(f"env built in {time.time() - t0:.1f}s", flush=True)

    cfg = ModelConfig()
    proc = VCFProcessor(sources=sources, config=cfg)
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jax.numpy.bfloat16))(
        jax.random.key(0)
    )
    proc.set_params(params)
    tissues = [f"tissue{i}" for i in range(args.tissues)]

    # Warm the device compile outside the measured window for EVERY donor
    # shape the sweep will dispatch: the full d=batch_size groups plus the
    # final short group when --genes is not a multiple of --batch-size
    # (each distinct d is its own executable).
    t0 = time.time()
    warm_counts = {min(args.batch_size, args.genes)}
    if args.genes % args.batch_size:
        warm_counts.add(args.genes % args.batch_size)
    for n in sorted(warm_counts):
        genome_wide_expression(
            proc, vcf, tissues, genes=[f"GENE{i:03d}.1" for i in range(n)],
            batch_size=n,
        )
    print(f"warm-up (compile) in {time.time() - t0:.1f}s", flush=True)

    import json

    stats = {}
    t0 = time.time()
    df = genome_wide_expression(
        proc, vcf, tissues, batch_size=args.batch_size, stats=stats,
        out_dir=args.out_dir,
    )
    dt = time.time() - t0
    if df is None:  # streamed shards (--out-dir)
        import glob

        shards = sorted(glob.glob(os.path.join(args.out_dir, "*.parquet")))
        df = pd.concat([pd.read_parquet(s, columns=["gene_id"]) for s in shards])
        print(f"artifact: {len(shards)} parquet shards in {args.out_dir}")
    n = df["gene_id"].nunique()
    print(
        f"sustained: {n} genes x {args.tissues} tissues in {dt:.1f}s "
        f"= {n / dt:.2f} genes/s (host+device integrated)"
    )
    print(json.dumps({
        "metric": "sustained_genes_per_s_end_to_end",
        "genes": n, "tissues": args.tissues,
        "genes_per_s": round(n / dt, 3), **stats,
    }))


if __name__ == "__main__":
    main()
