"""Shared helpers for the example scripts: real-artifact wiring when the
released artifacts are present, otherwise a self-contained synthetic genome
with a tiny randomly initialized model (so every example runs anywhere)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from variantformer_tpu.api.vcfprocessor import DataSources  # noqa: E402
from variantformer_tpu.config import (  # noqa: E402
    DatasetConfig,
    ModelConfig,
    Seq2GeneConfig,
    WindowEncoderConfig,
)
from variantformer_tpu.utils.assets import artifacts_dir, resolve_vocab_path  # noqa: E402


def artifacts_present() -> bool:
    base = artifacts_dir()
    return (base / "v4_pcg_epoch11_checkpoint.pth").exists() and (
        base / "GRCh38_no_alt_analysis_set_GCA_000001405.15.fasta.gz"
    ).exists()


def real_sources(model_class: str = "v4_pcg") -> tuple[DataSources, ModelConfig]:
    base = artifacts_dir()
    gencode = (
        "all_genes_v1_pcg_gencodeV24.csv"
        if model_class == "v4_pcg"
        else "all_genes_ag_gencodeV24.csv"
    )
    sources = DataSources(
        fasta_path=str(base / "GRCh38_no_alt_analysis_set_GCA_000001405.15.fasta.gz"),
        gencode_path=str(base / gencode),
        checkpoint_path=str(base / f"{model_class}_checkpoint.pth"),
        tokenizer_checkpoint_path=str(base / "pretrained_tokenizers_checkpoint.pth"),
        af_path=str(base / "1KG_af_hg38_tables"),
    )
    return sources, ModelConfig(model_class=model_class)


def synthetic_env(root: str | Path):
    """Build a 3kb synthetic genome + donor VCF + tiny model config."""
    from variantformer_tpu.utils.bgzf import write_bgzf

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    chr_len = 3000
    seq = "".join(rng.choice(list("ACGT"), chr_len))
    fasta = root / "genome.fa"
    with open(fasta, "w") as fh:
        fh.write(">chr1 synthetic\n")
        for i in range(0, chr_len, 60):
            fh.write(seq[i : i + 60] + "\n")
    gencode = root / "gencode.csv"
    pd.DataFrame(
        [
            {"gene_id": "GENE1.1", "gene_name": "GENE1", "chromosome": "chr1",
             "start": 500, "end": 1400, "strand": "+"},
            {"gene_id": "GENE2.1", "gene_name": "GENE2", "chromosome": "chr1",
             "start": 1600, "end": 2500, "strand": "-"},
        ]
    ).to_csv(gencode, index=False)
    cre_maps = {
        "GENE1.1": pd.DataFrame(
            [{"chromosome": "chr1", "start_cre": 300, "end_cre": 380, "cre_name": "dELS"},
             {"chromosome": "chr1", "start_cre": 700, "end_cre": 760, "cre_name": "pELS"}]
        ),
        "GENE2.1": pd.DataFrame(
            [{"chromosome": "chr1", "start_cre": 1700, "end_cre": 1780,
              "cre_name": "PLS,CTCF-bound"}]
        ),
    }
    ref = seq[320]
    alt = {"A": "G", "C": "T", "G": "A", "T": "C"}[ref]
    vcf = root / "donor.vcf.gz"
    write_bgzf(
        str(vcf),
        ("##fileformat=VCFv4.2\n"
         "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
         f"chr1\t321\t.\t{ref}\t{alt}\t.\tPASS\t.\tGT\t0|1\n").encode(),
    )
    tissue_vocab = root / "tissues.yaml"
    tissue_vocab.write_text("".join(f"tissue{i}: {i}\n" for i in range(8)))
    cfg = ModelConfig(
        window_encoder=WindowEncoderConfig(
            vocab_size=500, embedding_dim=32, num_heads=4, num_layers=2,
            ffn_hidden_dim=64, token_length=16,
        ),
        seq2gene=Seq2GeneConfig(
            emb_dim=32, gene_emb_dim=32, token_dim=32, num_heads=4,
            num_layers=2, ffn_hidden_dim=64,
        ),
        dataset=DatasetConfig(
            max_length=16, max_chunks=8, cre_neighbour_hood=5,
            gene_upstream_neighbour_hood=20, gene_downstream_neighbour_hood=400,
        ),
    )
    sources = DataSources(
        fasta_path=str(fasta),
        gencode_path=str(gencode),
        bpe_vocab_path=resolve_vocab_path("bpe_vocabulary_500.json"),
        tissue_vocab_path=str(tissue_vocab),
        cre_map_provider=lambda g: cre_maps[g],
    )
    return sources, cfg, {"vcf": str(vcf), "variant": ("chr1", 321, ref, alt)}


def build_processor(synthetic_root="/tmp/vfx_example"):
    """Returns (processor, extras) — real artifacts when present, else synthetic."""
    import jax

    from variantformer_tpu.api.vcfprocessor import VCFProcessor
    from variantformer_tpu.models.init import init_seq2gene

    if artifacts_present():
        sources, cfg = real_sources()
        proc = VCFProcessor(sources=sources, config=cfg)
        proc.load_model()
        return proc, {"vcf": str(artifacts_dir() / "HG00096.vcf.gz")}
    sources, cfg, extras = synthetic_env(synthetic_root)
    proc = VCFProcessor(sources=sources, config=cfg)
    proc.set_params(init_seq2gene(jax.random.key(0), cfg))
    print("[synthetic mode: released artifacts not found; using a tiny "
          "random model on a 3kb genome]")
    return proc, extras
