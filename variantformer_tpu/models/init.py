"""Random parameter initialization (pytree construction).

Defines the canonical parameter tree shapes for the window encoder and the
hierarchical model. Real deployments load converted reference checkpoints
(models/convert.py); random init exists for tests, benchmarking, and training
from scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from variantformer_tpu.config import ModelConfig, WindowEncoderConfig


def _linear(key, fan_in: int, fan_out: int, stacked: int | None = None, dtype=jnp.float32):
    """Torch-style uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) linear init."""
    bound = fan_in ** -0.5
    wshape = (fan_in, fan_out) if stacked is None else (stacked, fan_in, fan_out)
    bshape = (fan_out,) if stacked is None else (stacked, fan_out)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, wshape, dtype, -bound, bound),
        "b": jax.random.uniform(kb, bshape, dtype, -bound, bound),
    }


def _norm(dim: int, stacked: int | None = None, dtype=jnp.float32):
    shape = (dim,) if stacked is None else (stacked, dim)
    return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}


def _context_layer_stack(key, num_layers: int, dim: int, hidden: int, dtype=jnp.float32):
    """Stacked params for self+cross+GeGLU encoder layers."""
    keys = jax.random.split(key, 7)
    return {
        "norm1": _norm(dim, num_layers, dtype),
        "norm2": _norm(dim, num_layers, dtype),
        "norm3": _norm(dim, num_layers, dtype),
        "mixer": {
            "wqkv": _linear(keys[0], dim, 3 * dim, num_layers, dtype),
            "out": _linear(keys[1], dim, dim, num_layers, dtype),
        },
        "cross": {
            "wq": _linear(keys[2], dim, dim, num_layers, dtype),
            "wkv": _linear(keys[3], dim, 2 * dim, num_layers, dtype),
            "out": _linear(keys[4], dim, dim, num_layers, dtype),
        },
        "ffn_in": _linear(keys[5], dim, hidden, num_layers, dtype),
        "ffn_out": _linear(keys[6], hidden // 2, dim, num_layers, dtype),
    }


def _plain_layer_stack(key, num_layers: int, dim: int, hidden: int, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    return {
        "norm1": _norm(dim, num_layers, dtype),
        "norm2": _norm(dim, num_layers, dtype),
        "mixer": {
            "wqkv": _linear(keys[0], dim, 3 * dim, num_layers, dtype),
            "out": _linear(keys[1], dim, dim, num_layers, dtype),
        },
        "ffn_in": _linear(keys[2], dim, hidden, num_layers, dtype),
        "ffn_out": _linear(keys[3], hidden // 2, dim, num_layers, dtype),
    }


def init_window_encoder(key, cfg: WindowEncoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    e = cfg.embedding_dim
    if cfg.use_context:
        layers = _context_layer_stack(
            keys[2], cfg.num_layers, e, cfg.ffn_hidden_dim, dtype
        )
    else:
        layers = _plain_layer_stack(
            keys[2], cfg.num_layers, e, cfg.ffn_hidden_dim, dtype
        )
    return {
        "token_embedding": jax.random.normal(keys[0], (cfg.vocab_size, e), dtype),
        "context_embedding": jax.random.normal(keys[1], (9, e), dtype),
        "layers": layers,
        "tissue_classifiers": {
            "w": jax.random.normal(keys[3], (cfg.num_tissues, e, cfg.num_classes), dtype)
            * (e ** -0.5),
            "b": jnp.zeros((cfg.num_tissues, cfg.num_classes), dtype),
        },
    }


def init_seq2gene(key, cfg: ModelConfig, dtype=jnp.float32):
    mcfg = cfg.seq2gene
    wcfg = cfg.window_encoder
    e = mcfg.emb_dim
    keys = jax.random.split(key, 9)
    heads_keys = jax.random.split(keys[8], 3)
    # multi_head=False (the released configuration) shares one head across
    # tissues; the stacked-head tree then has a single entry.
    t = mcfg.num_tissues if mcfg.multi_head else 1
    params = {
        "cre_tokenizer": init_window_encoder(keys[0], wcfg, dtype),
        "gene_tokenizer": init_window_encoder(keys[1], wcfg, dtype),
        "cre_map": _linear(keys[2], mcfg.token_dim, e, None, dtype),
        "gene_map": _linear(keys[3], mcfg.gene_emb_dim, e, None, dtype),
        "registry": jax.random.normal(keys[4], (mcfg.num_tissues, e), dtype),
        "context_embedding": jax.random.normal(keys[5], (9, e), dtype),
        "cre_layers": _context_layer_stack(
            keys[6], mcfg.num_layers - 1, e, mcfg.ffn_hidden_dim, dtype
        ),
        "gene_layers": _context_layer_stack(
            keys[7], mcfg.num_layers, e, mcfg.ffn_hidden_dim, dtype
        ),
        "tissue_heads": {
            "w1": jax.random.uniform(heads_keys[0], (t, e, e), dtype, -(e ** -0.5), e ** -0.5),
            "b1": jnp.zeros((t, e), dtype),
            "ln_scale": jnp.ones((t, e), dtype),
            "ln_bias": jnp.zeros((t, e), dtype),
            "w2": jax.random.uniform(heads_keys[1], (t, e, e), dtype, -(e ** -0.5), e ** -0.5),
            "b2": jnp.zeros((t, e), dtype),
            "w3": jax.random.uniform(heads_keys[2], (t, e, 1), dtype, -(e ** -0.5), e ** -0.5),
            "b3": jnp.zeros((t, 1), dtype),
        },
    }
    return params


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
