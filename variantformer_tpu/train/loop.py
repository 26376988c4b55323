"""Epoch-level training driver — the Lightning-Trainer counterpart.

The reference trains Seq2Reg through ``pytorch_lightning.Trainer`` (fit
loop, per-epoch validation, ``ReduceLROnPlateau`` stepped once per epoch on
``val_loss``, checkpointing — seq2reg/model.py:304-353,451-517); the Seq2Gene
release defines losses but ships no entry point. This module reconstructs
that layer TPU-first:

  * the jitted step functions (train/steps.py) stay pure; the loop is plain
    Python around them — no tracing of data-dependent control flow,
  * ``PlateauTracker`` reproduces torch ``ReduceLROnPlateau`` semantics
    exactly (mode=min, relative threshold, patience in epochs, cooldown) and
    feeds the resulting LR *scale* into the step as the optimizer's extra
    ``value`` (build the optimizer with ``plateau="epoch"``),
  * checkpoint/resume snapshots the FULL ``TrainState`` (params + optimizer
    state + step) via orbax, with a JSON history sidecar; ``fit(resume=True)``
    continues mid-run after preemption,
  * shard-backed batch iterators consume the npz shards that
    ``data/train_pipeline.py`` writes (fixed ``chunk_size`` rows per shard —
    the static-shape contract: every step reuses one compiled executable).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Callable, Iterable, NamedTuple

import jax
import numpy as np

from variantformer_tpu.train.steps import TrainState

log = logging.getLogger(__name__)


class PlateauTracker:
    """torch ``ReduceLROnPlateau`` (mode="min", threshold_mode="rel"),
    tracked in Python at epoch cadence. ``update(val_loss)`` returns the LR
    scale to use for the NEXT epoch's steps.

    Reference config: patience=2, factor=lr_scale, min_lr=1e-7
    (seq2reg/model.py:503-510); ``min_scale`` expresses min_lr as a fraction
    of the base LR.
    """

    def __init__(
        self,
        patience: int = 2,
        factor: float = 0.5,
        threshold: float = 1e-4,
        cooldown: int = 0,
        min_scale: float = 1e-3,
    ):
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_scale = min_scale
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_left = 0
        self.scale = 1.0

    def update(self, value: float) -> float:
        # torch order of operations: track best/bad first, then the cooldown
        # counter decrements on EVERY epoch while active (suppressing bad
        # counts), then the reduction check.
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_left > 0:
            self.cooldown_left -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.cooldown_left = self.cooldown
            self.num_bad = 0
        return self.scale

    def state_dict(self) -> dict:
        return {
            "best": self.best, "num_bad": self.num_bad,
            "cooldown_left": self.cooldown_left, "scale": self.scale,
        }

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.num_bad = d["num_bad"]
        self.cooldown_left = d["cooldown_left"]
        self.scale = d["scale"]


def save_train_state(path: str | Path, state: TrainState) -> None:
    """Snapshot the full TrainState (params + optimizer state + step)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / "state", tree, force=True)


def load_train_state(path: str | Path, template: TrainState) -> TrainState:
    """Restore into ``template``'s structure (a freshly-initialized
    TrainState from the same config/optimizer) — optax's nested namedtuple
    optimizer state round-trips exactly."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    tree = {"params": template.params, "opt_state": template.opt_state,
            "step": template.step}
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path / "state", item=tree)
    return TrainState(
        restored["params"], restored["opt_state"], restored["step"]
    )


class FitResult(NamedTuple):
    state: TrainState
    history: list[dict]      # per-epoch {epoch, train_loss, val_loss, lr_scale}
    best_val: float
    best_epoch: int


def fit(
    state: TrainState,
    step_fn: Callable,
    train_batches: Callable[[int], Iterable[tuple]],
    *,
    eval_loss: Callable[[TrainState], float] | None = None,
    epochs: int = 1,
    ckpt_dir: str | Path | None = None,
    plateau: PlateauTracker | None = None,
    early_stop_patience: int | None = None,
    resume: bool = False,
    mesh=None,
    shard_fn: Callable[[tuple], tuple] | None = None,
) -> FitResult:
    """Run the fit loop.

    Args:
      state: initial TrainState (params + opt_state from the SAME optimizer
        the step was built with; use ``make_optimizer(..., plateau="epoch")``
        so the per-epoch LR scale applies).
      step_fn: jitted ``(state, *batch, plateau_value) -> (state, loss)``
        from train/steps.py.
      train_batches: ``epoch -> iterable of step-arg tuples``. Called once
        per epoch (reshuffle inside using the epoch as seed).
      eval_loss: ``state -> float`` validation loss, computed once per epoch;
        drives the plateau scheduler, best-checkpoint selection and early
        stopping. Without it, the epoch's mean train loss is monitored
        (the reference monitors val_loss).
      epochs: total epochs (including any already completed when resuming).
      ckpt_dir: when set, ``last/`` + ``history.json`` are written every
        epoch and ``best/`` whenever the monitored loss improves.
      plateau: per-epoch LR tracker; defaults to the reference's
        ReduceLROnPlateau config (patience=2).
      early_stop_patience: stop after this many epochs without improvement
        (None = never).
      resume: restore ``ckpt_dir/last`` + history and continue.
      mesh: a ``jax.sharding.Mesh`` — DP+TP training in one flag: the
        TrainState is placed via ``parallel.mesh.shard_train_state`` (after
        any resume restore) and every batch tuple via ``shard_step_args``;
        GSPMD inserts the gradient all-reduce and TP collectives.
      shard_fn: override for the per-batch placement (multi-host runs pass
        ``parallel.launch.globalize_step_args`` and globalize the state
        themselves — see scripts/launch_train.py); with ``shard_fn`` set and
        ``mesh=None`` the TrainState is used as given. For donor-DP training
        that keeps the fused Pallas kernels per chip, pass
        ``step_fn=parallel.mesh.donor_dp_train_step(...)``,
        ``shard_fn=parallel.mesh.donor_dp_shard_fn(mesh)`` and a
        ``parallel.mesh.replicate_train_state``-placed state (mesh=None).
    """
    plateau = plateau or PlateauTracker()
    history: list[dict] = []
    best_val = float("inf")
    best_epoch = -1
    start_epoch = 0

    if ckpt_dir is not None:
        ckpt_dir = Path(ckpt_dir).absolute()
    if resume:
        if ckpt_dir is None:
            raise ValueError("resume=True requires ckpt_dir")
        hist_file = ckpt_dir / "history.json"
        if hist_file.exists():
            saved = json.loads(hist_file.read_text())
            history = saved["epochs"]
            best_val = saved["best_val"]
            best_epoch = saved["best_epoch"]
            plateau.load_state_dict(saved["plateau"])
            start_epoch = len(history)
            state = load_train_state(ckpt_dir / "last", state)
            log.info("resumed at epoch %d (best_val=%.4g)", start_epoch, best_val)

    if mesh is not None:
        from variantformer_tpu.parallel.mesh import shard_step_args, shard_train_state

        state = shard_train_state(state, mesh)
        if shard_fn is None:
            shard_fn = lambda b: shard_step_args(b, mesh)

    def _save() -> None:
        if ckpt_dir is None:
            return
        save_train_state(ckpt_dir / "last", state)
        (ckpt_dir / "history.json").write_text(json.dumps({
            "epochs": history, "best_val": best_val,
            "best_epoch": best_epoch, "plateau": plateau.state_dict(),
        }, indent=2))

    for epoch in range(start_epoch, epochs):
        # checked at the top so a resumed run that already early-stopped
        # does not train (and checkpoint) one extra epoch
        if (
            early_stop_patience is not None
            and best_epoch >= 0
            and len(history) - 1 - best_epoch >= early_stop_patience
        ):
            log.info(
                "early stop at epoch %d (best epoch %d)",
                len(history) - 1, best_epoch,
            )
            break
        lr_scale = plateau.scale
        losses = []
        for batch in train_batches(epoch):
            if shard_fn is not None:
                batch = shard_fn(tuple(batch))
            state, loss = step_fn(state, *batch, lr_scale)
            losses.append(loss)
        if not losses:
            raise ValueError(f"train_batches({epoch}) yielded no batches")
        train_loss = float(np.mean([np.asarray(l) for l in losses]))
        val = float(eval_loss(state)) if eval_loss is not None else train_loss
        plateau.update(val)
        history.append({
            "epoch": epoch, "train_loss": train_loss, "val_loss": val,
            "lr_scale": lr_scale,
        })
        improved = val < best_val
        if improved:
            best_val, best_epoch = val, epoch
        _save()
        if improved and ckpt_dir is not None:
            save_train_state(ckpt_dir / "best", state)
        log.info(
            "epoch %d: train %.4g val %.4g lr_scale %.3g%s",
            epoch, train_loss, val, lr_scale, " *best*" if improved else "",
        )

    return FitResult(state, history, best_val, best_epoch)


def seq2reg_shard_batches(
    shard_dir: str | Path,
    tissue_vocab: dict[str, int],
    *,
    split: str = "train",
    label_key: str = "tissue_class",
    shuffle: bool = True,
) -> Callable[[int], Iterable[tuple]]:
    """Batch iterator over ``data/train_pipeline.Seq2RegShardWriter`` output.

    Each npz shard is one fixed-size step batch (tokens, tok_len, context,
    tissue_ids, labels): ``context`` is the reference cCRE class of each
    window (the model's context-embedding input) and ``labels`` the
    tissue-specific class to predict — the reference training pairing
    (seq2reg/model.py:304-318). Shard order reshuffles every epoch.
    """
    shard_dir = Path(shard_dir)
    files = sorted((shard_dir / split).glob("*.npz"))
    if not files:
        raise FileNotFoundError(f"no shards under {shard_dir / split}")

    def batches(epoch: int):
        order = np.arange(len(files))
        if shuffle:
            np.random.default_rng(epoch).shuffle(order)
        for i in order:
            z = np.load(files[i])
            if "tissue" in z.files:
                tissue = str(z["tissue"])
            else:
                # Older shards: recover the tissue from the
                # {subject}_{tissue}_{chrom}_chunk_{n} name. Subject and
                # tissue names may themselves contain underscores, so the
                # name is only trustworthy when exactly ONE vocab key
                # matches as the middle section's suffix — e.g. subject
                # "HG_upper" + tissue "lung" vs tissue "upper_lung" are
                # indistinguishable, and guessing would silently train
                # against the wrong tissue embedding.
                middle = "_".join(files[i].stem.split("_")[:-3])
                hits = [
                    t for t in tissue_vocab
                    if middle == t or middle.endswith("_" + t)
                ]
                if len(hits) != 1:
                    raise ValueError(
                        f"cannot {'recover a' if not hits else 'unambiguously pick the'} "
                        f"vocab tissue from legacy shard name "
                        f"{files[i].name!r} (matches: {sorted(hits)}); "
                        "re-write the shards with the current "
                        "Seq2RegShardWriter, which embeds a 'tissue' key"
                    )
                tissue = hits[0]
            tid = tissue_vocab[tissue]
            n = z["tokens"].shape[0]
            yield (
                z["tokens"].astype(np.int32),
                z["tok_len"].astype(np.int32),
                z["ref_class"].astype(np.int32),
                np.full((n,), tid, np.int32),
                z[label_key].astype(np.int32),
            )

    return batches


def seq2gene_shard_batches(
    shard_dir: str | Path,
    tissue_ids: list[int],
    *,
    batch_size: int = 1,
    shuffle: bool = True,
    bucket_step: int = 64,
    gene_cap: int | None = 200,
    process_split: tuple[int, int] | None = None,
) -> Callable[[int], Iterable[tuple]]:
    """Batch iterator over ``data/train_pipeline.TrainingShardWriter``
    output for the seq2gene train step: yields ``(Seq2GeneBatch, targets,
    target_mask)``. Every donor is scored against the same ``tissue_ids``
    vector (the model fans each donor out across tissues); the per-shard
    sparse (tissue, expression) labels fill ``targets`` where present and
    the mask elsewhere. Short final batches pad by repeating the last
    sample with a zeroed mask, so every step reuses one compiled
    executable per bucket shape (choose ``bucket_step`` ≥ the CRE-count
    spread to stay on a single shape).

    ``process_split=(process_index, process_count)`` takes this host's
    round-robin share of the shard files — the multi-host DP split (each
    host's local batches concatenate into the global batch via
    ``parallel.launch.globalize_step_args``)."""
    import jax.numpy as jnp

    from variantformer_tpu.data.pipeline import GeneSample, pack_samples

    shard_dir = Path(shard_dir)
    files = sorted(shard_dir.glob("*__*.npz"))
    if not files:
        raise FileNotFoundError(f"no seq2gene shards under {shard_dir}")
    if process_split is not None:
        # Every host must see the SAME number of local batches — a host
        # with one extra batch would enqueue a global collective the others
        # never join (DCN deadlock at epoch end) — so each epoch's globally
        # shared permutation is truncated to a multiple of process_count
        # before the round-robin slice. With shuffle on, a DIFFERENT random
        # remainder is dropped each epoch, so no shard is permanently
        # excluded; without it, the trailing shards are (warned below).
        pi, pc = process_split
        if len(files) < pc:
            raise ValueError(
                f"{len(files)} shard(s) under {shard_dir} cannot feed "
                f"{pc} processes one batch each"
            )
        if len(files) % pc and not shuffle:
            log.warning(
                "multi-host split drops the %d trailing shard(s) of %d "
                "every epoch (shuffle=False)", len(files) % pc, len(files),
            )
    tissue_arr = np.asarray(tissue_ids, np.int32)
    pos = {int(t): i for i, t in enumerate(tissue_arr)}

    def _load(path: Path) -> tuple[GeneSample, np.ndarray, np.ndarray]:
        z = np.load(path)
        gene_id = path.stem.split("__")[0]
        sample = GeneSample(
            gene_id=gene_id,
            strand="+" if int(z["strand"]) == 0 else "-",
            cre_tokens=z["cre_tokens"].astype(np.int32),
            cre_tok_len=z["cre_tok_len"].astype(np.int32),
            cre_labels=z["cre_labels"].astype(np.int32),
            gene_tokens=z["gene_tokens"].astype(np.int32),
            gene_tok_len=z["gene_tok_len"].astype(np.int32),
        )
        tgt = np.zeros((len(tissue_arr),), np.float32)
        msk = np.zeros((len(tissue_arr),), bool)
        for tid, val in zip(z["tissue_ids"], z["targets"]):
            i = pos.get(int(tid))
            if i is not None:
                tgt[i] = val
                msk[i] = True
        return sample, tgt, msk

    def batches(epoch: int):
        order = np.arange(len(files))
        if shuffle:
            # Same epoch seed on every host -> every host derives the same
            # global permutation, so the round-robin slice below is a
            # consistent partition of each epoch's batches.
            np.random.default_rng(epoch).shuffle(order)
        if process_split is not None:
            pi, pc = process_split
            order = order[pi : len(order) - len(order) % pc : pc]
        for lo in range(0, len(order), batch_size):
            idx = list(order[lo : lo + batch_size])
            pad = batch_size - len(idx)
            loaded = [_load(files[i]) for i in idx]
            if pad:
                sample, tgt, _ = loaded[-1]
                loaded += [(sample, tgt, np.zeros_like(tgt, bool))] * pad
            samples = [s for s, _, _ in loaded]
            targets = np.stack([t for _, t, _ in loaded])
            mask = np.stack([m for _, _, m in loaded])
            batch = pack_samples(
                samples, tissue_ids=list(tissue_arr),
                bucket_step=bucket_step, gene_cap=gene_cap,
            )
            yield (batch, jnp.asarray(targets), jnp.asarray(mask))

    return batches


def _mean_eval_loss(one, batches_fn, shard_fn) -> Callable[[TrainState], float]:
    """state -> mean of the jitted per-batch loss over ``batches_fn(0)``."""

    def eval_loss(state: TrainState) -> float:
        vals = []
        for b in batches_fn(0):
            if shard_fn is not None:
                b = shard_fn(tuple(b))
            vals.append(np.asarray(one(state.params, *b), dtype=np.float64))
        if not vals:
            raise ValueError("eval batches yielded nothing")
        return float(np.mean(vals))

    return eval_loss


def make_seq2gene_eval_loss(
    cfg, batches_fn, shard_fn=None
) -> Callable[[TrainState], float]:
    """Mean validation loss over one pass of ``batches_fn(0)``.

    Multi-host runs MUST pass the same ``shard_fn`` they give ``fit`` (e.g.
    ``lambda b: globalize_step_args(b, mesh)``) so every host evaluates the
    same GLOBAL batches — host-local eval batches against global params
    would enqueue divergent programs on the shared mesh and deadlock."""
    from variantformer_tpu.train.steps import seq2gene_loss_fn

    @jax.jit
    def one(params, batch, targets, mask):
        return seq2gene_loss_fn(params, batch, targets, mask, cfg)

    return _mean_eval_loss(one, batches_fn, shard_fn)


def make_seq2reg_eval_loss(
    cfg, batches_fn, shard_fn=None
) -> Callable[[TrainState], float]:
    """Mean validation loss over one pass of ``batches_fn(0)`` (use
    ``seq2reg_shard_batches(..., split="test", shuffle=False)``). See
    ``make_seq2gene_eval_loss`` for the multi-host ``shard_fn`` contract."""
    from variantformer_tpu.train.steps import seq2reg_loss_fn

    @jax.jit
    def one(params, tokens, tok_len, context, tissue_ids, labels):
        loss, _ = seq2reg_loss_fn(
            params, tokens, tok_len, context, tissue_ids, labels, cfg
        )
        return loss

    return _mean_eval_loss(one, batches_fn, shard_fn)
