"""finetune_seq2gene — fine-tune expression predictions on your own labels.

The reference release defines the Seq2Gene losses but ships no training
entry point (model_combined_modulator.py:533-538; SURVEY §0); this is the
complete fine-tune flow this framework adds:

  1. build training shards from a donor VCF + (gene, donor, tissue, TPM)
     expression table (data/train_pipeline.TrainingShardWriter),
  2. fit with the epoch loop — per-epoch validation, ReduceLROnPlateau,
     best-checkpoint tracking (train/loop.fit),
  3. save the fine-tuned params as a native checkpoint and load them back
     into a VCFProcessor for inference.

Runs on the bundled synthetic environment; point the DataSources at real
artifacts for an actual fine-tune.
"""

import sys
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd


def main(root: str | None = None):
    from _common import artifacts_present, synthetic_env

    import jax

    if not artifacts_present():
        # Synthetic demo mode uses a tiny random model: run on CPU so the
        # demo is deterministic and does not hinge on accelerator
        # availability (CI executes the examples this way too).
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from variantformer_tpu.api.vcfprocessor import VCFProcessor
    from variantformer_tpu.data.train_pipeline import TrainingShardWriter
    from variantformer_tpu.models.checkpoint import load_checkpoint, save_checkpoint
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.loop import (
        fit,
        load_train_state,
        make_seq2gene_eval_loss,
        seq2gene_shard_batches,
    )
    from variantformer_tpu.train.optimizer import make_optimizer
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    root = Path(root or tempfile.mkdtemp(prefix="vfx_finetune_"))
    sources, cfg, extras = synthetic_env(root / "env")
    proc = VCFProcessor(sources=sources, config=cfg)

    # 1. Training shards: the processor's sample builder reads the donor VCF
    # (diploid consensus) exactly as inference does — train/serve parity.
    expression = pd.DataFrame(
        [
            {"gene_id": "GENE1.1", "donor": "S1", "tissue": "tissue0", "TPM": 8.0, "FPKM": 6.0},
            {"gene_id": "GENE1.1", "donor": "S1", "tissue": "tissue3", "TPM": 0.2, "FPKM": 0.1},
            {"gene_id": "GENE2.1", "donor": "S1", "tissue": "tissue0", "TPM": 1.0, "FPKM": 0.8},
            {"gene_id": "GENE2.1", "donor": "S1", "tissue": "tissue3", "TPM": 4.0, "FPKM": 3.0},
        ]
    )
    (_, builder), _ = proc.create_data(
        extras["vcf"],
        pd.DataFrame({"gene_id": ["GENE1.1", "GENE2.1"],
                      "tissues": ["tissue0,tissue3"] * 2}),
    )
    writer = TrainingShardWriter(
        builders={"S1": builder},
        expression=expression,
        tissue_vocab=proc.tissue_vocab,
        out_dir=root / "shards",
    )
    written = writer.build_all(["GENE1.1", "GENE2.1"], ["S1"])
    print(f"built {len(written)} training shards")

    # 2. Fit. A real fine-tune starts from load_checkpoint(...); the
    # synthetic demo starts from random init.
    params = init_seq2gene(jax.random.key(0), cfg)
    tx = make_optimizer(
        params, learning_rate=3e-3, plateau="epoch", train_gene_tokenizer=False
    )
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    # Tokenizers are frozen (the reference's training contract), so skip
    # building their backward pass entirely.
    step = make_seq2gene_train_step(cfg, tx, freeze_tokenizers=True)
    tissues = [proc.tissue_vocab["tissue0"], proc.tissue_vocab["tissue3"]]
    train_b = seq2gene_shard_batches(root / "shards", tissues, batch_size=2)
    val_b = seq2gene_shard_batches(
        root / "shards", tissues, batch_size=2, shuffle=False
    )
    res = fit(
        state, step, train_b,
        eval_loss=make_seq2gene_eval_loss(cfg, val_b),
        epochs=6, ckpt_dir=root / "fit",
    )
    print(f"fit: val {res.history[0]['val_loss']:.4f} -> "
          f"{res.history[-1]['val_loss']:.4f} (best epoch {res.best_epoch})")

    # 3. Ship the best params as a native checkpoint; reload for inference.
    best = load_train_state(root / "fit" / "best", res.state)
    save_checkpoint(root / "finetuned", best.params, cfg)
    params2, cfg2 = load_checkpoint(root / "finetuned")
    proc2 = VCFProcessor(sources=sources, config=cfg2)
    proc2.set_params(params2)
    out = proc2.predict(
        extras["vcf"],
        pd.DataFrame({"gene_id": ["GENE1.1", "GENE2.1"],
                      "tissues": ["tissue0,tissue3"] * 2}),
    )
    for _, row in out.iterrows():
        for name, value in zip(row["tissue_names"], row["predicted_expression"]):
            print(f"  {row['gene_id']:10s} {name:10s} pred {value:8.4f}")
    assert res.history[-1]["val_loss"] < res.history[0]["val_loss"]
    return res, out


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
