"""Fused gene-modulator custom VJP vs the layered XLA path (interpreter).

The backward design (two recompute pallas_calls per layer from checkpointed
x/h streams) is documented in ops/fused_modulator.py; these tests pin the
gradient contract: d(gene_stream), d(cre_intermediates) and every gene-layer
weight gradient must match the XLA stack's autodiff to bf16 tolerance
(both sides are bf16-internal, so rel L2 < 5e-2 — the same convention as
tests/test_fused_encoder.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.mid

from variantformer_tpu.models.core import AttnSpec
from variantformer_tpu.models.init import _context_layer_stack
from variantformer_tpu.models.seq2gene import _gene_layer
from variantformer_tpu.ops.alibi import alibi_slopes
from variantformer_tpu.ops.fused_modulator import (
    fused_gene_modulator_diff,
    fused_gene_modulator_packed,
    pack_gene_layers,
)

E, H, HD, F, L = 32, 4, 8, 64, 3
T, G1, C, DN = 5, 9, 24, 2
SCALE = HD ** -0.5


def _setup(seed=0):
    layers = _context_layer_stack(jax.random.key(seed), L, E, F)
    rng = np.random.default_rng(seed)
    gene = jnp.asarray(rng.normal(size=(DN, T, G1, E)) * 0.5, jnp.float32)
    cre = jnp.asarray(rng.normal(size=(L, DN, C, E)) * 0.5, jnp.float32)
    gene_lens = jnp.asarray([G1, 5], jnp.int32)
    cre_lens = jnp.asarray([C, 11], jnp.int32)
    slopes = jnp.asarray(alibi_slopes(H))
    # loss weights, masked to each donor's valid gene rows
    w = rng.normal(size=(DN, T, G1, E)).astype(np.float32)
    for di in range(DN):
        w[di, :, int(gene_lens[di]):] = 0.0
    return layers, gene, cre, gene_lens, cre_lens, slopes, jnp.asarray(w)


def _xla_stack(layers, gene, cre, gene_lens, cre_lens, slopes):
    spec = AttnSpec(H, HD)
    x = gene.astype(jnp.bfloat16)
    for i in range(L):
        lp = jax.tree.map(lambda a: a[i], layers)
        x = _gene_layer(
            lp, x, cre[i].astype(jnp.bfloat16), gene_lens, cre_lens,
            slopes, False, spec, jnp.bfloat16,
        )
    return x


def test_diff_primal_matches_packed():
    """Outside jax.grad, the diff wrapper IS the inference kernel."""
    layers, gene, cre, gene_lens, cre_lens, slopes, _ = _setup()
    packed = pack_gene_layers(layers, H, HD)
    ref = fused_gene_modulator_packed(
        gene, cre, gene_lens, cre_lens, packed, slopes, F, SCALE, H, HD,
        tissue_block=2,
    )
    out = fused_gene_modulator_diff(
        gene, cre, gene_lens, cre_lens, layers, slopes, SCALE, H, HD, 2
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=0,
    )


def test_vjp_grads_match_xla_path():
    """d(gene), d(cre_intermediates) and every weight grad vs XLA autodiff."""
    layers, gene, cre, gene_lens, cre_lens, slopes, w = _setup(seed=3)

    def loss_fused(gene, cre, layers):
        out = fused_gene_modulator_diff(
            gene, cre, gene_lens, cre_lens, layers, slopes, SCALE, H, HD, 2
        )
        return jnp.sum(out.astype(jnp.float32) * w)

    def loss_xla(gene, cre, layers):
        out = _xla_stack(layers, gene, cre, gene_lens, cre_lens, slopes)
        return jnp.sum(out.astype(jnp.float32) * w)

    (vf, gf) = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        gene, cre, layers
    )
    (vx, gx) = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
        gene, cre, layers
    )
    np.testing.assert_allclose(float(vf), float(vx), rtol=2e-2)

    flat_f, tree_f = jax.tree_util.tree_flatten_with_path(gf)
    flat_x = jax.tree.leaves(gx)
    assert len(flat_f) == len(flat_x)
    for (path, a), b in zip(flat_f, flat_x):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / max(1e-6, np.linalg.norm(b))
        assert rel < 5e-2, f"{jax.tree_util.keystr(path)}: grad rel L2 {rel}"


def test_vjp_pad_gene_rows_zero_grad():
    """Gene rows past gene_len must receive (near-)zero gradient: they are
    masked as keys and their query outputs carry zero loss weight."""
    layers, gene, cre, gene_lens, cre_lens, slopes, w = _setup(seed=4)

    def loss(gene):
        out = fused_gene_modulator_diff(
            gene, cre, gene_lens, cre_lens, layers, slopes, SCALE, H, HD, 2
        )
        return jnp.sum(out.astype(jnp.float32) * w)

    dg = np.asarray(jax.grad(loss)(gene), np.float32)
    for di in range(DN):
        gl = int(gene_lens[di])
        if gl < G1:
            assert np.abs(dg[di, :, gl:]).max() == 0.0, (
                f"donor {di} pad rows leak"
            )
        assert np.abs(dg[di, :, :gl]).max() > 0


def test_train_step_fused2_runs_and_matches_xla():
    """make_seq2gene_train_step(impl='fused2'): loss trajectory tracks the
    XLA step and the gene-layer weights actually move."""
    from tests.test_model_smoke import tiny_batch, tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.optimizer import make_optimizer
    from variantformer_tpu.train.steps import (
        TrainState,
        make_seq2gene_train_step,
    )

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    targets = jnp.asarray(
        np.random.default_rng(1).uniform(0, 3, (2, 3)), jnp.float32
    )
    mask = jnp.ones((2, 3), bool)

    def run(impl):
        tx = make_optimizer(
            params, learning_rate=3e-3, train_gene_tokenizer=False
        )
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = make_seq2gene_train_step(
            cfg, tx, impl=impl, freeze_tokenizers=True
        )
        losses = []
        for _ in range(3):
            state, loss = step(state, batch, targets, mask)
            losses.append(float(loss))
        return state, losses

    xla_state, xla_losses = run("xla")
    f2_state, f2_losses = run("fused2")
    assert f2_losses[-1] < f2_losses[0]
    np.testing.assert_allclose(f2_losses, xla_losses, rtol=5e-2)
    moved = np.abs(
        np.asarray(f2_state.params["gene_layers"]["ffn_in"]["w"])
        - np.asarray(params["gene_layers"]["ffn_in"]["w"])
    ).max()
    assert moved > 0, "gene-layer weights did not train under fused2"
