"""Fused gene-modulator kernel vs the layered XLA path (Pallas interpreter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variantformer_tpu.models.core import AttnSpec
from variantformer_tpu.models.init import _context_layer_stack
from variantformer_tpu.models.seq2gene import _gene_layer
from variantformer_tpu.ops.alibi import alibi_slopes
from variantformer_tpu.ops.fused_modulator import fused_gene_modulator

E, H, D, F, L = 32, 4, 8, 64, 3
T, G1, C = 5, 9, 24


def _setup(seed=0):
    layers = _context_layer_stack(jax.random.key(seed), L, E, F)
    rng = np.random.default_rng(seed)
    gene = jnp.asarray(rng.normal(size=(T, G1, E)) * 0.5, jnp.float32)
    cre = jnp.asarray(rng.normal(size=(L, C, E)) * 0.5, jnp.float32)
    slopes = jnp.asarray(alibi_slopes(H))
    return layers, gene, cre, slopes


def _xla_reference(layers, gene, cre, gene_len, cre_len, slopes):
    spec = AttnSpec(H, D)
    x = gene[None].astype(jnp.bfloat16)  # [1, T, G1, E]
    for i in range(L):
        layer_p = jax.tree.map(lambda a: a[i], layers)
        x = _gene_layer(
            layer_p, x, cre[i][None].astype(jnp.bfloat16),
            jnp.asarray([gene_len], jnp.int32), jnp.asarray([cre_len], jnp.int32),
            slopes, False, spec, jnp.bfloat16,
        )
    return x[0]


def test_fused_modulator_matches_layered():
    layers, gene, cre, slopes = _setup()
    gene_len, cre_len = 7, 20
    ref = _xla_reference(layers, gene, cre, gene_len, cre_len, slopes)
    out = fused_gene_modulator(
        gene, cre, jnp.int32(gene_len), jnp.int32(cre_len), layers, slopes,
        D ** -0.5, H, D, tissue_block=2,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[:, :gene_len],
        np.asarray(ref, np.float32)[:, :gene_len],
        rtol=3e-2, atol=3e-2,
    )


def test_fused_modulator_tissue_block_invariance():
    """T not a multiple of the tissue block must still match."""
    layers, gene, cre, slopes = _setup(seed=1)
    args = (gene, cre, jnp.int32(G1), jnp.int32(C), layers, slopes, D ** -0.5, H, D)
    out2 = fused_gene_modulator(*args, tissue_block=2)
    out5 = fused_gene_modulator(*args, tissue_block=5)
    np.testing.assert_allclose(
        np.asarray(out2, np.float32), np.asarray(out5, np.float32),
        rtol=1e-2, atol=1e-2,
    )
    assert out2.shape == (T, G1, E)


def test_fused_modulator_no_alibi():
    layers, gene, cre, _ = _setup(seed=2)
    ref = _xla_reference(layers, gene, cre, G1, C, None)
    out = fused_gene_modulator(
        gene, cre, jnp.int32(G1), jnp.int32(C), layers, None,
        D ** -0.5, H, D, tissue_block=3,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.mid
def test_seq2gene_forward_fused2_matches_xla():
    """End-to-end dispatch: impl='fused2' (fused encoder + fused modulator)
    must match the XLA path on the full forward."""
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward
    from tests.test_model_smoke import tiny_batch, tiny_config

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    ref = seq2gene_forward(params, batch, cfg, impl="xla")
    out = seq2gene_forward(params, batch, cfg, impl="fused2")
    np.testing.assert_allclose(
        np.asarray(out.pred_expression), np.asarray(ref.pred_expression),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out.pooled_embedding), np.asarray(ref.pooled_embedding),
        rtol=6e-2, atol=6e-2,
    )


def test_fused_modulator_length_edges():
    """Minimal valid lengths: registry-only gene stream, few CRE windows."""
    layers, gene, cre, slopes = _setup(seed=3)
    for gene_len, cre_len in ((1, 2), (3, 1)):
        ref = _xla_reference(layers, gene, cre, gene_len, cre_len, slopes)
        out = fused_gene_modulator(
            gene, cre, jnp.int32(gene_len), jnp.int32(cre_len), layers, slopes,
            D ** -0.5, H, D, tissue_block=2,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32)[:, :gene_len],
            np.asarray(ref, np.float32)[:, :gene_len],
            rtol=3e-2, atol=3e-2,
        )


@pytest.mark.mid
def test_fused_modulator_donor_batched_matches_per_donor():
    """The donor-folded grid must reproduce per-donor single calls exactly
    (same kernel math, donors only share streamed weights)."""
    layers, gene, cre, slopes = _setup(seed=3)
    d = 3
    rng = np.random.default_rng(7)
    gene_d = jnp.asarray(rng.normal(size=(d, T, G1, E)) * 0.5, jnp.float32)
    cre_d = jnp.asarray(rng.normal(size=(L, d, C, E)) * 0.5, jnp.float32)
    gene_lens = jnp.asarray([G1, 5, 7], jnp.int32)
    cre_lens = jnp.asarray([C, 11, 18], jnp.int32)
    batched = fused_gene_modulator(
        gene_d, cre_d, gene_lens, cre_lens, layers, slopes,
        D ** -0.5, H, D, tissue_block=2,
    )
    assert batched.shape == (d, T, G1, E)
    for di in range(d):
        single = fused_gene_modulator(
            gene_d[di], cre_d[:, di], gene_lens[di], cre_lens[di], layers,
            slopes, D ** -0.5, H, D, tissue_block=2,
        )
        gl = int(gene_lens[di])
        np.testing.assert_allclose(
            np.asarray(batched[di, :, :gl], np.float32),
            np.asarray(single[:, :gl], np.float32),
            rtol=1e-6, atol=1e-6, err_msg=f"donor {di}",
        )
    # donor_block chunking path: force chunks of 2 over 3 donors
    from variantformer_tpu.ops.fused_modulator import (
        fused_gene_modulator_packed,
        pack_gene_layers,
    )

    packed = pack_gene_layers(layers, H, D)
    chunked = fused_gene_modulator_packed(
        gene_d, cre_d, gene_lens, cre_lens, packed, slopes,
        layers["ffn_in"]["w"].shape[-1], D ** -0.5, H, D,
        tissue_block=2, donor_block=2,
    )
    np.testing.assert_allclose(
        np.asarray(chunked, np.float32), np.asarray(batched, np.float32),
        rtol=0, atol=0,
    )
