"""Training losses, numerically matching the reference's torch losses.

  * poisson_nll: torch.nn.PoissonNLLLoss(log_input=False, full=True)
    (reference model_combined_modulator.py:533-538) — input - target*log(input)
    plus the Stirling approximation term for target > 1,
  * focal loss (reference seq2reg/losses.py:7-28),
  * weighted cross-entropy with the released class-weight tables,
  * dual contrastive loss over normalized embeddings with learnable
    temperature (reference seq2reg/model.py:319-351).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def poisson_nll(pred: jax.Array, target: jax.Array, full: bool = True, eps: float = 1e-8):
    """Elementwise Poisson NLL with log_input=False, matching torch semantics."""
    loss = pred - target * jnp.log(pred + eps)
    if full:
        stirling = (
            target * jnp.log(target) - target + 0.5 * jnp.log(2 * jnp.pi * target)
        )
        loss = loss + jnp.where(target > 1, stirling, 0.0)
    return loss


def mse(pred: jax.Array, target: jax.Array):
    return jnp.square(pred - target)


def cross_entropy(logits: jax.Array, labels: jax.Array, class_weight=None):
    """Elementwise CE over [N, C] logits; optional per-class weights
    (torch's weighted CrossEntropyLoss with reduction='none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weight is not None:
        nll = nll * jnp.asarray(class_weight)[labels]
    return nll


def focal_loss(logits: jax.Array, labels: jax.Array, gamma: float = 0.0):
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(logpt)
    return -((1.0 - pt) ** gamma) * logpt


def dual_contrastive_loss(
    embeddings: jax.Array, logit_scale: jax.Array | None = None
):
    """Symmetric InfoNCE over in-batch normalized embeddings (reference
    seq2reg/model.py:319-339). Returns the mean of row/column CE."""
    emb = embeddings.reshape(embeddings.shape[0], -1)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True).clip(1e-12)
    adj = emb @ emb.T
    if logit_scale is not None:
        adj = adj * jnp.exp(logit_scale)
    labels = jnp.arange(adj.shape[0])
    l1 = cross_entropy(adj, labels)
    l2 = cross_entropy(adj.T, labels)
    return (l1.sum() + l2.sum()) / 2.0


def get_classification_loss(loss_type: str, gamma: float = 0.0, class_weight=None):
    if loss_type == "cross_entropy":
        return lambda logits, labels: cross_entropy(logits, labels)
    if loss_type == "weighted_cross_entropy":
        cw = np.asarray(class_weight, np.float32)
        return lambda logits, labels: cross_entropy(logits, labels, cw)
    if loss_type == "focal":
        return lambda logits, labels: focal_loss(logits, labels, gamma)
    raise ValueError(f"unknown loss {loss_type}")
