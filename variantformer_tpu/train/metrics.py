"""Classification eval metrics for Seq2Reg training.

The reference logs per-class F1, accuracy, and the same again per tissue at
every validation step (seq2reg/model.py:355-436, ``logf1``). Here the
metrics are computed host-side over a full validation pass (vectorized
numpy — no per-class Python/device round trips) and returned as one flat
dict using the reference's metric-name scheme:

  ``{prefix}val_f1_class_{class_name}`` / ``{prefix}val_acc``

with ``prefix = ""`` for the global metrics and ``"{tissue}_"`` for the
per-tissue ones (commas stripped from class names, as the reference does).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def per_class_f1(
    preds: np.ndarray, labels: np.ndarray, num_classes: int
) -> dict[int, float]:
    """F1 per class, skipping classes with no true samples (reference
    behavior: classes absent from the batch are not logged)."""
    out: dict[int, float] = {}
    for c in range(num_classes):
        t = labels == c
        if not t.any():
            continue
        p = preds == c
        tp = float((p & t).sum())
        fp = float((p & ~t).sum())
        fn = float((~p & t).sum())
        precision = tp / (tp + fp) if tp + fp > 0 else 0.0
        recall = tp / (tp + fn) if tp + fn > 0 else 0.0
        out[c] = (
            2 * precision * recall / (precision + recall)
            if precision + recall > 0
            else 0.0
        )
    return out


def classification_metrics(
    preds: np.ndarray,
    labels: np.ndarray,
    class_names: Sequence[str],
    tissue_ids: np.ndarray | None = None,
    tissue_names: dict[int, str] | None = None,
) -> dict[str, float]:
    """Flat metric dict: global acc + per-class F1, then the same per
    tissue when ``tissue_ids`` is given."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    metrics: dict[str, float] = {}

    def emit(prefix: str, p: np.ndarray, y: np.ndarray) -> None:
        for c, f1 in per_class_f1(p, y, len(class_names)).items():
            name = str(class_names[c]).replace(",", "")
            metrics[f"{prefix}val_f1_class_{name}"] = f1
        metrics[f"{prefix}val_acc"] = float((p == y).mean())

    emit("", preds, labels)
    if tissue_ids is not None:
        tissue_ids = np.asarray(tissue_ids)
        for tid in np.unique(tissue_ids):
            sel = tissue_ids == tid
            tname = (
                tissue_names.get(int(tid), str(int(tid)))
                if tissue_names
                else str(int(tid))
            )
            emit(f"{tname}_", preds[sel], labels[sel])
    return metrics


def make_seq2reg_eval_metrics(
    cfg,
    batches_fn: Callable,
    class_names: Sequence[str],
    tissue_names: dict[int, str] | None = None,
    shard_fn=None,
) -> Callable:
    """state -> metric dict over one pass of ``batches_fn(0)`` (pair with
    ``loop.make_seq2reg_eval_loss``; same multi-host ``shard_fn``
    contract)."""
    import jax
    import jax.numpy as jnp

    from variantformer_tpu.models.core import AttnSpec
    from variantformer_tpu.models.seq2reg import classify_windows, encode_windows

    wcfg = cfg.window_encoder
    spec = AttnSpec(wcfg.num_heads, wcfg.embedding_dim // wcfg.num_heads)

    @jax.jit
    def predict(params, tokens, tok_len, context, tissue_ids):
        emb = encode_windows(
            params, tokens, tok_len, context, wcfg, spec, jnp.float32
        )
        return jnp.argmax(classify_windows(params, emb, tissue_ids), axis=-1)

    def _host(x) -> np.ndarray:
        # Multi-host runs globalize batches (shard_fn), so predictions and
        # labels span other hosts' devices — np.asarray would raise on
        # non-fully-addressable arrays. Gather the full array everywhere.
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    def eval_metrics(state) -> dict[str, float]:
        preds, labels, tissues = [], [], []
        for b in batches_fn(0):
            if shard_fn is not None:
                b = shard_fn(tuple(b))
            tokens, tok_len, context, tissue_ids, y = b
            preds.append(
                _host(predict(state.params, tokens, tok_len, context,
                              tissue_ids))
            )
            labels.append(_host(y))
            tissues.append(_host(tissue_ids))
        if not preds:
            raise ValueError("eval batches yielded nothing")
        return classification_metrics(
            np.concatenate(preds),
            np.concatenate(labels),
            class_names,
            tissue_ids=np.concatenate(tissues),
            tissue_names=tissue_names,
        )

    return eval_metrics
