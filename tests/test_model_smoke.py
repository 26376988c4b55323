"""Shape/NaN smoke tests for the end-to-end model on tiny configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variantformer_tpu.config import (
    ModelConfig,
    Seq2GeneConfig,
    WindowEncoderConfig,
)
from variantformer_tpu.models.init import count_params, init_seq2gene
from variantformer_tpu.models.seq2gene import Seq2GeneBatch, seq2gene_forward


def tiny_config() -> ModelConfig:
    return ModelConfig(
        window_encoder=WindowEncoderConfig(
            vocab_size=32, embedding_dim=16, num_heads=2, num_layers=2,
            ffn_hidden_dim=32, token_length=8,
        ),
        seq2gene=Seq2GeneConfig(
            emb_dim=24, gene_emb_dim=16, token_dim=16, num_heads=4,
            num_layers=3, ffn_hidden_dim=48,
        ),
    )


def tiny_batch(rng: np.random.Generator, d=2, c=5, g=4, l=8, t=3) -> Seq2GeneBatch:
    cre_tok_len = rng.integers(1, l + 1, size=(d, c)).astype(np.int32)
    gene_tok_len = rng.integers(1, l + 1, size=(d, g)).astype(np.int32)
    cre_count = rng.integers(1, c + 1, size=(d,)).astype(np.int32)
    gene_count = rng.integers(1, g + 1, size=(d,)).astype(np.int32)

    def suffix_pad_tokens(lens, maxlen, vocab):
        out = np.zeros((*lens.shape, maxlen), dtype=np.int32)
        for idx in np.ndindex(lens.shape):
            n = lens[idx]
            out[idx][:n] = rng.integers(4, vocab, size=n)
        return out

    return Seq2GeneBatch(
        cre_tokens=jnp.asarray(suffix_pad_tokens(cre_tok_len, l, 32)),
        cre_tok_len=jnp.asarray(cre_tok_len),
        cre_count=jnp.asarray(cre_count),
        cre_labels=jnp.asarray(rng.integers(0, 9, size=(d, c)).astype(np.int32)),
        gene_tokens=jnp.asarray(suffix_pad_tokens(gene_tok_len, l, 32)),
        gene_tok_len=jnp.asarray(gene_tok_len),
        gene_count=jnp.asarray(gene_count),
        tissue_ids=jnp.asarray(rng.integers(0, 63, size=(t,)).astype(np.int32)),
    )


def test_forward_shapes_and_finiteness():
    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    out = seq2gene_forward(params, batch, cfg)
    d, t, e = 2, 3, cfg.seq2gene.emb_dim
    assert out.pred_expression.shape == (d, t)
    assert out.pooled_embedding.shape == (d, t, e)
    assert np.all(np.isfinite(out.pred_expression))
    assert np.all(np.isfinite(out.pooled_embedding))
    assert np.all(out.pred_expression >= 0)  # softplus head


@pytest.mark.mid
def test_suffix_padding_invariance():
    """Growing the padded C/G/T slot counts must not change valid outputs."""
    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    batch = tiny_batch(rng, d=1, c=4, g=3, t=2)

    def pad_axis(x, axis, extra, fill=0):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, extra)
        return jnp.pad(x, pad, constant_values=fill)

    wider = Seq2GeneBatch(
        cre_tokens=pad_axis(batch.cre_tokens, 1, 3),
        cre_tok_len=pad_axis(batch.cre_tok_len, 1, 3),
        cre_count=batch.cre_count,
        cre_labels=pad_axis(batch.cre_labels, 1, 3),
        gene_tokens=pad_axis(batch.gene_tokens, 1, 2),
        gene_tok_len=pad_axis(batch.gene_tok_len, 1, 2),
        gene_count=batch.gene_count,
        tissue_ids=batch.tissue_ids,
    )
    out_a = seq2gene_forward(params, batch, cfg)
    out_b = seq2gene_forward(params, wider, cfg)
    np.testing.assert_allclose(
        np.asarray(out_a.pred_expression), np.asarray(out_b.pred_expression),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.mid
def test_cre_token_axis_bucket_invariance():
    """A narrower CRE token axis (pack_samples' per-batch bucket) must give
    the same outputs as the full-max_length one: suffix padding is exact."""
    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(4), cfg)
    rng = np.random.default_rng(5)
    batch = tiny_batch(rng, d=2, c=4, g=3, t=2)
    l = batch.cre_tokens.shape[2]
    lens = np.minimum(np.asarray(batch.cre_tok_len), l // 2)
    tokens = np.asarray(batch.cre_tokens).copy()
    for i in range(tokens.shape[0]):
        for j in range(tokens.shape[1]):
            tokens[i, j, lens[i, j]:] = 0
    full = batch._replace(
        cre_tokens=jnp.asarray(tokens), cre_tok_len=jnp.asarray(lens)
    )
    narrow = full._replace(cre_tokens=full.cre_tokens[:, :, : l // 2])
    out_a = seq2gene_forward(params, full, cfg)
    out_b = seq2gene_forward(params, narrow, cfg)
    np.testing.assert_allclose(
        np.asarray(out_a.pred_expression), np.asarray(out_b.pred_expression),
        rtol=2e-2, atol=2e-2,
    )


def test_vep_position_gathers():
    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(2), cfg)
    batch = tiny_batch(np.random.default_rng(3), d=3, c=5, g=4, t=2)
    batch = batch._replace(
        cre_token_position=jnp.asarray([0, 1, 0], jnp.int32),
        gene_token_position=jnp.asarray([0, 0, 1], jnp.int32),
    )
    out = seq2gene_forward(params, batch, cfg)
    assert out.gene_token_embedding.shape == (3, 2, cfg.seq2gene.emb_dim)
    assert np.any(np.asarray(out.gene_token_embedding) != 0)
    assert np.all(np.isfinite(np.asarray(out.cre_token_embedding)))


def test_param_count_full_size():
    """The full-size config should land in the ~1.2B-parameter class."""
    cfg = ModelConfig()
    # Count without materializing: use eval_shape.
    shapes = jax.eval_shape(lambda k: init_seq2gene(k, cfg), jax.random.key(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 0.9e9 < n < 1.6e9, f"param count {n/1e9:.2f}B out of expected range"
