"""Checkpoint loading + config calibration.

TPU-native equivalent of the reference ModelManager
(/root/reference/processors/model_manager.py:21-121): loads the torch
Lightning checkpoints, converts them to the framework's stacked pytrees
(models/convert.py), and calibrates the model configs from the checkpoints'
hyper-parameters. The combined 1.2B checkpoint's tokenizer weights overwrite
the standalone tokenizer checkpoint, matching the reference's load order.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp

from variantformer_tpu.config import ModelConfig, WindowEncoderConfig
from variantformer_tpu.models import convert

log = logging.getLogger(__name__)


@dataclasses.dataclass
class LoadedModel:
    params: dict
    config: ModelConfig


class ModelManager:
    def __init__(self, cfg: ModelConfig, tokenizer_checkpoint_path: str | None = None):
        self.cfg = cfg
        self.tokenizer_checkpoint_path = tokenizer_checkpoint_path

    def _calibrate_encoder_cfg(self, hyper: dict) -> WindowEncoderConfig:
        wcfg = self.cfg.window_encoder
        updates = {}
        mapping = {
            "vocab_size": "vocab_size",
            "embedding_dim": "embedding_dim",
            "num_heads": "num_heads",
            "num_layers": "num_layers",
            "num_tissues": "num_tissues",
            "num_classes": "num_classes",
            "use_context": "use_context",
            "positional_encoding": "positional_encoding",
            "seq_pool": "seq_pool",
            "strand_agg": "strand_agg",
        }
        for src, dst in mapping.items():
            if src in hyper and hyper[src] is not None:
                updates[dst] = hyper[src]
        return dataclasses.replace(wcfg, **updates)

    def load_model(self, param_dtype=jnp.bfloat16) -> LoadedModel:
        cfg = self.cfg
        wcfg = cfg.window_encoder
        if self.tokenizer_checkpoint_path:
            log.info("Loading tokenizer checkpoint %s", self.tokenizer_checkpoint_path)
            _, tok_hyper = convert.load_torch_checkpoint(self.tokenizer_checkpoint_path)
            wcfg = self._calibrate_encoder_cfg(tok_hyper)
            cfg = dataclasses.replace(cfg, window_encoder=wcfg)

        log.info("Loading model checkpoint %s", cfg.checkpoint_path)
        sd, hyper = convert.load_torch_checkpoint(cfg.checkpoint_path)
        if hyper:
            mcfg = cfg.seq2gene
            updates = {
                k: hyper[k]
                for k in (
                    "emb_dim", "gene_emb_dim", "num_heads", "num_layers",
                    "use_alibi", "use_context", "gene_pooling", "num_tissues",
                    "token_dim",
                )
                if k in hyper and hyper[k] is not None
            }
            for flag in ("only_cross_attention", "use_bigger_head", "multi_head"):
                if flag in hyper:
                    updates[flag] = hyper[flag]
            mcfg = dataclasses.replace(mcfg, **updates)
            cfg = dataclasses.replace(cfg, seq2gene=mcfg)
        # Head layout is authoritative from the weights: multi_head stores one
        # Sequential per tissue (tissue_expressions.{t}.0.weight); the released
        # checkpoints share one head (tissue_expressions.0.weight).
        if "tissue_heads.tissue_expressions.0.weight" in sd:
            cfg = dataclasses.replace(
                cfg, seq2gene=dataclasses.replace(cfg.seq2gene, multi_head=False)
            )
        elif "tissue_heads.tissue_expressions.0.0.weight" in sd:
            cfg = dataclasses.replace(
                cfg, seq2gene=dataclasses.replace(cfg.seq2gene, multi_head=True)
            )
        # Window-encoder layer flavor is authoritative from the weights.
        uses_ctx = convert.window_encoder_uses_context(sd, "cre_tokenizer")
        cfg = dataclasses.replace(
            cfg,
            window_encoder=dataclasses.replace(cfg.window_encoder, use_context=uses_ctx),
        )

        params = convert.convert_seq2gene(
            sd,
            num_heads=cfg.seq2gene.num_heads,
            encoder_num_heads=cfg.window_encoder.num_heads,
        )
        params = jax.tree.map(lambda x: jnp.asarray(x, param_dtype), params)
        n = sum(x.size for x in jax.tree.leaves(params))
        log.info("Loaded %.2fB parameters", n / 1e9)
        return LoadedModel(params=params, config=cfg)
