"""Jittable training steps for both model stages.

The reference ships training hooks but no entry point (SURVEY.md §0); these
steps reconstruct the training semantics as pure functions:

  * seq2gene: Poisson NLL (or MSE) on per-(donor, tissue) expression
    (reference model_combined_modulator.py:533-538),
  * seq2reg: per-tissue CRE classification with focal/weighted CE, optional
    dual contrastive loss (reference seq2reg/model.py:304-353).

Gradients flow through the XLA attention path by default; the fused window
encoder (ops/fused_encoder.py) and the fused gene modulator
(ops/fused_modulator.py) both carry recompute Pallas backwards via custom
VJPs, so ``impl="fused"`` (fused encoder only) and ``impl="fused2"`` (fused
encoder + fused gene stack) are both legal in training steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from variantformer_tpu.config import ModelConfig
from variantformer_tpu.models.seq2gene import Seq2GeneBatch, seq2gene_forward
from variantformer_tpu.train import losses as L


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def seq2gene_loss_fn(
    params, batch: Seq2GeneBatch, targets: jax.Array, target_mask: jax.Array,
    cfg: ModelConfig, impl: str = "xla", stop_cre_grads: bool = False,
    stop_gene_grads: bool = False,
):
    """targets/target_mask: [D, T] expression labels and validity.

    ``stop_cre_grads``/``stop_gene_grads`` stop gradients at the tokenizer
    subtrees. The reference always trains seq2gene with a frozen CRE
    tokenizer (model_combined_modulator.py:462-471); without this, the step
    still BUILDS the window-encoder backward (the encoding stage is ~1/3 of
    forward FLOPs) only for the optimizer to zero the result. Stopping the
    gradient lets XLA dead-code-eliminate that backward; with
    ``impl="fused"`` the DCE also prunes the fused encoder's checkpointing
    forward back down to the inference kernel."""
    if impl == "fused2" and "gene_layers_packed" in params:
        # Packed weights would shadow gene_layers on the forward and receive
        # the gradient instead; training params carry the raw tree only.
        raise ValueError(
            "fused2 training params must not contain 'gene_layers_packed'"
        )
    if stop_cre_grads or stop_gene_grads:
        params = dict(params)
        if stop_cre_grads:
            params["cre_tokenizer"] = jax.lax.stop_gradient(
                params["cre_tokenizer"]
            )
        if stop_gene_grads:
            params["gene_tokenizer"] = jax.lax.stop_gradient(
                params["gene_tokenizer"]
            )
    out = seq2gene_forward(params, batch, cfg, impl=impl)
    pred = out.pred_expression
    if cfg.seq2gene.loss_fn == "poisson":
        elem = L.poisson_nll(pred, targets)
    else:
        elem = L.mse(pred, targets)
    elem = jnp.where(target_mask, elem, 0.0)
    return elem.sum() / jnp.maximum(target_mask.sum(), 1)


def make_seq2gene_train_step(
    cfg: ModelConfig, tx: optax.GradientTransformation, plateau: str = "epoch",
    impl: str = "xla", freeze_tokenizers: bool = False,
    train_gene_tokenizer: bool = False,
):
    """``plateau`` must match the mode the optimizer was built with
    (optimizer.py): it picks the default ``value`` fed to ``tx.update`` when
    the step is called without ``plateau_value`` — a neutral 1.0 LR scale
    for "epoch", the step's own loss for "step" (feeding a constant 1.0 to
    ``reduce_on_plateau`` would count every step as non-improving and
    silently decay the LR to the floor).

    ``freeze_tokenizers=True`` skips building the frozen tokenizers'
    backward entirely; ``train_gene_tokenizer`` must MATCH the flag the
    optimizer was built with (it decides whether the gene tokenizer's
    gradient is stopped too — stopping it while the optimizer still
    decays/updates that subtree would silently corrupt it). ``impl="fused"``
    runs the fused-encoder Pallas kernel in the training forward; with
    trainable tokenizers its custom VJP (checkpointing forward + recompute
    Pallas backward, ops/fused_encoder.py) carries the gradients, and with
    frozen tokenizers XLA DCEs the backward away entirely."""
    assert plateau in ("step", "epoch")
    if impl not in ("xla", "fused", "fused2"):
        raise ValueError(
            f"training impl must be 'xla', 'fused' or 'fused2', got {impl!r}"
        )

    @jax.jit
    def step(state: TrainState, batch, targets, target_mask, plateau_value=None):
        loss, grads = jax.value_and_grad(seq2gene_loss_fn)(
            state.params, batch, targets, target_mask, cfg,
            impl=impl,
            stop_cre_grads=freeze_tokenizers,
            stop_gene_grads=freeze_tokenizers and not train_gene_tokenizer,
        )
        if plateau_value is None:
            plateau_value = loss if plateau == "step" else 1.0
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params, value=plateau_value
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def seq2reg_loss_fn(
    params, tokens, tok_len, context, tissue_ids, labels, cfg,
    loss_type: str = "cross_entropy", gamma: float = 0.0, class_weight=None,
    use_dual_loss: bool = False, logit_scale=None, dual_fraction=None,
):
    from variantformer_tpu.models.core import AttnSpec
    from variantformer_tpu.models.seq2reg import classify_windows, encode_windows

    wcfg = cfg.window_encoder
    spec = AttnSpec(wcfg.num_heads, wcfg.embedding_dim // wcfg.num_heads)
    emb = encode_windows(
        params, tokens, tok_len, context, wcfg, spec, jnp.float32
    )
    logits = classify_windows(params, emb, tissue_ids)
    clf = L.get_classification_loss(loss_type, gamma, class_weight)
    loss = clf(logits, labels).sum()
    if use_dual_loss:
        dual = L.dual_contrastive_loss(emb, logit_scale)
        frac = (
            dual_fraction
            if dual_fraction is not None
            else jnp.clip(
                jax.lax.stop_gradient(loss) / jax.lax.stop_gradient(dual),
                0.01, 100.0,
            )
        )
        loss = loss + frac * dual
    return loss, logits


def make_seq2reg_train_step(cfg: ModelConfig, tx, plateau: str = "epoch", **loss_kwargs):
    """See ``make_seq2gene_train_step`` for the ``plateau`` contract."""
    assert plateau in ("step", "epoch")

    @jax.jit
    def step(
        state: TrainState, tokens, tok_len, context, tissue_ids, labels,
        plateau_value=None,
    ):
        (loss, _), grads = jax.value_and_grad(seq2reg_loss_fn, has_aux=True)(
            state.params, tokens, tok_len, context, tissue_ids, labels, cfg,
            **loss_kwargs,
        )
        if plateau_value is None:
            plateau_value = loss if plateau == "step" else 1.0
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params, value=plateau_value
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step
