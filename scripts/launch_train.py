#!/usr/bin/env python
"""Multi-host distributed training launcher.

Run one copy per host (e.g. one per TPU-pod worker). Each host initializes
``jax.distributed``, takes its round-robin share of the training shards, and
contributes its donors to every GLOBAL batch: one mesh spans all hosts'
devices, GSPMD all-reduces the gradients across hosts (DCN) — true
data-parallel training, not independent per-host runs. The reference has no
training entry point at all (SURVEY §0); its Lightning config trains on one
GPU.

Example (2 hosts):
    python scripts/launch_train.py --shards /data/shards --tissue-ids 0,2 \
        --epochs 3 --global-batch 8 --out /tmp/train \
        --coordinator host0:9999 --num-processes 2 --process-id $ID
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shards", required=True, help="seq2gene npz shard dir")
    ap.add_argument("--tissue-ids", required=True,
                    help="comma-separated tissue ids to train against")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--global-batch", type=int, default=None,
                    help="donors per global step (default: one per process)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--coordinator", default=None, help="host:port for jax.distributed")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--tiny-model", action="store_true",
                    help="tiny random config (CI / smoke runs)")
    ap.add_argument("--checkpoint", default=None,
                    help="native checkpoint dir to fine-tune from "
                         "(default: random init — smoke runs)")
    ap.add_argument("--no-shuffle", action="store_true",
                    help="deterministic shard order (lockstep testing)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); needed on rigs "
                         "whose sitecustomize overrides JAX_PLATFORMS")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("launch_train")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from variantformer_tpu.config import (
        ModelConfig,
        PrecisionPolicy,
        Seq2GeneConfig,
        WindowEncoderConfig,
    )
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.parallel.launch import (
        globalize_step_args,
        globalize_train_state,
        initialize_distributed,
    )
    from variantformer_tpu.train.loop import fit, seq2gene_shard_batches
    from variantformer_tpu.train.optimizer import make_optimizer
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    topo = initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    pc = topo["process_count"]

    if args.tiny_model:
        cfg = ModelConfig(
            window_encoder=WindowEncoderConfig(
                vocab_size=64, embedding_dim=32, num_heads=4, num_layers=1,
                ffn_hidden_dim=64, token_length=8,
            ),
            seq2gene=Seq2GeneConfig(
                emb_dim=32, gene_emb_dim=32, token_dim=32, num_heads=4,
                num_layers=2, ffn_hidden_dim=64,
            ),
            precision=PrecisionPolicy(compute_dtype="float32"),
        )
    else:
        cfg = ModelConfig()

    # One DP mesh over every device of every host; replicated params.
    devices = np.asarray(jax.devices()).reshape(-1, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    if args.checkpoint:
        from variantformer_tpu.models.checkpoint import load_checkpoint

        params, ckpt_cfg = load_checkpoint(args.checkpoint)
        cfg = ckpt_cfg or cfg
    else:
        params = init_seq2gene(jax.random.key(0), cfg)
    tx = make_optimizer(params, learning_rate=args.lr, plateau="epoch")
    state = globalize_train_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh
    )
    step = make_seq2gene_train_step(cfg, tx)

    tissue_ids = [int(t) for t in args.tissue_ids.split(",")]
    global_batch = args.global_batch or pc
    if global_batch % pc:
        raise SystemExit(f"--global-batch {global_batch} not divisible by "
                         f"{pc} processes")
    train_b = seq2gene_shard_batches(
        args.shards, tissue_ids,
        batch_size=global_batch // pc,
        shuffle=not args.no_shuffle,
        process_split=(topo["process_index"], pc),
    )

    res = fit(
        state, step, train_b, epochs=args.epochs,
        shard_fn=lambda b: globalize_step_args(b, mesh),
    )

    out_dir = Path(args.out) / f"host_{topo['process_index']:03d}"
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "history.json").write_text(json.dumps({
        "host": topo["process_index"], "processes": pc,
        "global_batch": global_batch, "epochs": res.history,
    }, indent=2))
    log.info("done: final train loss %.6g", res.history[-1]["train_loss"])
    if topo["process_index"] == 0 and not args.tiny_model:
        from variantformer_tpu.models.checkpoint import save_checkpoint

        # gather replicated params to host before saving
        host_params = jax.tree.map(np.asarray, res.state.params)
        save_checkpoint(Path(args.out) / "trained", host_params, cfg)


if __name__ == "__main__":
    main()
