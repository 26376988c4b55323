"""Optimizer construction: Adam/AdamW with the reference's decay/no-decay
parameter split and plateau LR scheduling.

The reference exempts biases, LayerNorm and Embedding parameters from weight
decay (seq2reg/model.py:451-499). In our pytree that maps to: all ``b``
leaves, all norm ``scale``/``bias`` leaves (incl. tissue-head ln_*), and the
embedding tables (token/context embeddings, registry). Frozen subtrees
(the cre tokenizer; the gene tokenizer unless train_gene_tokenizer) get
zeroed updates.
"""

from __future__ import annotations

import jax
import optax

_NO_DECAY_LEAVES = {"b", "bias", "scale", "ln_scale", "ln_bias", "b1", "b2", "b3"}
_EMBEDDING_LEAVES = {
    "token_embedding", "context_embedding", "registry",
}


def _path_names(path) -> list[str]:
    return [p.key for p in path if hasattr(p, "key")]


def decay_mask(params):
    """True where weight decay applies."""

    def is_decay(path, leaf):
        names = _path_names(path)
        if not names:
            return False
        if names[-1] in _NO_DECAY_LEAVES:
            return False
        if names[-1] in _EMBEDDING_LEAVES:
            return False
        return True

    return jax.tree_util.tree_map_with_path(is_decay, params)


def trainable_mask(params, train_gene_tokenizer: bool = True):
    """False for frozen subtrees (reference model_combined_modulator.py:462-471)."""

    def is_trainable(path, leaf):
        names = _path_names(path)
        if names and names[0] == "cre_tokenizer":
            return False
        if names and names[0] == "gene_tokenizer" and not train_gene_tokenizer:
            return False
        return True

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def scale_by_extra_value():
    """Stateless GradientTransformationExtraArgs: multiply updates by the
    step's ``value`` extra arg. ``train.loop.fit`` uses this hook to apply
    per-EPOCH ReduceLROnPlateau scaling (the reference's cadence —
    ``scheduler.step(val_loss)`` once per epoch, seq2reg/model.py:503-517)
    from outside the jitted step: the tracker runs in Python, the scale
    rides in as a scalar."""

    def update(updates, state, params=None, *, value, **extra):
        del params, extra
        return jax.tree.map(lambda u: u * value, updates), state

    return optax.GradientTransformationExtraArgs(
        lambda params: optax.EmptyState(), update
    )


def make_optimizer(
    params,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    optimizer: str = "adam",
    train_gene_tokenizer: bool = True,
    plateau_patience: int = 2,
    plateau_factor: float = 0.5,
    min_scale: float = 1e-3,
    plateau: str = "epoch",
    accumulate_steps: int = 1,
):
    """Returns an optax GradientTransformationExtraArgs; ``update`` takes a
    ``value=`` extra arg whose meaning depends on ``plateau``:

      * ``"epoch"`` (default — what ``train.loop.fit`` assumes): ``value``
        is an LR *scale* computed by the caller per epoch
        (``train.loop.PlateauTracker`` reproduces torch ReduceLROnPlateau's
        semantics exactly); omitting it / passing 1.0 means no scaling,
      * ``"step"``: ``value`` is the monitored loss, fed to
        ``optax.contrib.reduce_on_plateau`` — patience counts *steps*, for
        streaming use outside the epoch loop. Do NOT combine with
        ``fit`` (which passes a ~1.0 scale as ``value``; reduce_on_plateau
        would read that as a never-improving loss and decay the LR to
        ``min_scale`` within patience*steps).

    ``accumulate_steps > 1`` wraps the whole chain in ``optax.MultiSteps``:
    gradients average over that many micro-batches before one real update —
    the static-shape way to train at effective batch sizes the donor
    buckets (or HBM) can't hold in one step. Plateau counters then tick per
    REAL update, not per micro-step.
    """
    assert optimizer in ("adam", "adamw")
    assert plateau in ("step", "epoch")
    if optimizer == "adamw" or weight_decay:
        # mask as a CALLABLE: under optax.masked the inner transform sees
        # the pruned (trainable-only) tree, so the decay mask must be
        # derived from whatever tree it is given, not pre-built here.
        base = optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.scale_by_learning_rate(learning_rate),
        )
    else:
        base = optax.adam(learning_rate)
    trainable = trainable_mask(params, train_gene_tokenizer)
    frozen = jax.tree.map(lambda t: not t, trainable)
    if plateau == "epoch":
        tail = scale_by_extra_value()
    else:
        # accumulation_size averages the micro-step losses, so one plateau
        # decision fires per REAL update on the k-window mean rather than
        # on a single noisy micro-batch.
        tail = optax.contrib.reduce_on_plateau(
            patience=plateau_patience,
            factor=plateau_factor,
            min_scale=min_scale,
            accumulation_size=accumulate_steps,
        )
    core = base
    if accumulate_steps > 1:
        # Inside masked(trainable) so accumulator buffers exist only for
        # trainable leaves — no HBM spent accumulating frozen-tokenizer
        # gradients the chain would zero anyway. The plateau tail stays
        # OUTSIDE: non-emit micro-steps carry zero updates (scale of zero
        # is zero), and step-mode plateau ticks on the k-window average.
        core = optax.MultiSteps(core, every_k_schedule=accumulate_steps)
    return optax.chain(
        optax.masked(optax.set_to_zero(), frozen),  # hard-freeze tokenizers
        optax.masked(core, trainable),
        tail,
    )
