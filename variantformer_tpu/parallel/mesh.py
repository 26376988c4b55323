"""Device mesh + GSPMD sharding for the hierarchical model.

The reference has no distributed backend (SURVEY.md §2.3); this layer is
designed TPU-first:

  * mesh axes ("data", "model"): donors/genes stream data-parallel over
    "data" (DCN at multi-host scale), the 1536-wide encoder stack shards
    tensor-parallel over "model" (ICI),
  * tensor parallelism is head/FFN sharding: packed QKV projections are
    stored head-major, so sharding their flat output dim across "model" is
    exact head parallelism; attention out-projections contract a sharded
    dim, and XLA inserts the psum,
  * everything else (embeddings, norms, registry, tissue heads) replicates.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
the same named shardings lay DP across hosts (DCN) and TP inside each host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from variantformer_tpu.models.seq2gene import Seq2GeneBatch


def make_mesh(num_model: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_model is None:
        num_model = next(m for m in (4, 2, 1) if n % m == 0)
    data = n // num_model
    return Mesh(
        np.asarray(devices).reshape(data, num_model), axis_names=("data", "model")
    )


# Leaf-name -> which axis (counted from the end) carries the "model" shard.
_MODEL_AXIS_FROM_END = {
    ("ffn_in", "w"): 1,
    ("ffn_in", "b"): 1,
    ("ffn_out", "w"): 2,
    ("wqkv", "w"): 1,
    ("wqkv", "b"): 1,
    ("wkv", "w"): 1,
    ("wkv", "b"): 1,
    ("wq", "w"): 1,
    ("wq", "b"): 1,
    ("out", "w"): 2,   # attention out-projection contracts the sharded dim
}


def param_specs(params) -> dict:
    """PartitionSpec pytree for a parameter tree (see module docstring)."""

    def spec_for(path, leaf) -> P:
        names = [p.key for p in path if hasattr(p, "key")]
        key = tuple(names[-2:])
        axis_from_end = _MODEL_AXIS_FROM_END.get(key)
        if axis_from_end is None or leaf.ndim < axis_from_end:
            return P()
        spec = [None] * leaf.ndim
        spec[leaf.ndim - axis_from_end] = "model"
        return P(*spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_specs(
    batch: Seq2GeneBatch, partition: str = "donor"
) -> Seq2GeneBatch:
    """PartitionSpecs for one device batch.

    partition="donor" (default): donor-leading arrays shard over "data",
    tissue ids replicate — classic DP over donors/genes.

    partition="tissue": single-donor scale-out (SURVEY §2.3's sequence-
    parallel option). ``tissue_ids`` shards over "data" so GSPMD propagates
    the shard through the per-tissue gene-stream fan-out — the FLOPs bulk
    (the [D, T, G1, E] gene stack; per-tissue streams never mix, so this is
    exact parallelism) — while the window axes of the token arrays shard the
    encoder stage over the same devices (XLA all-gathers window embeddings
    where the CRE stack attends across windows). Use when D is too small to
    fill the mesh (e.g. one donor, genome-wide sweep)."""
    if partition not in ("donor", "tissue"):
        raise ValueError(f"unknown batch partition {partition!r}")

    def donor_spec(name, leaf):
        if leaf is None:
            return None
        if name == "tissue_ids" or "pool" in name:
            return P()  # dedup pools are donor-shared
        return P("data", *([None] * (leaf.ndim - 1)))

    def tissue_spec(name, leaf):
        if leaf is None:
            return None
        if name == "tissue_ids":
            return P("data")
        if name in ("cre_tokens", "gene_tokens"):
            return P(None, "data", None)
        if name in ("cre_tok_len", "gene_tok_len", "cre_labels"):
            return P(None, "data")
        return P()  # counts + VEP positions replicate

    spec_for = donor_spec if partition == "donor" else tissue_spec
    return Seq2GeneBatch(
        **{name: spec_for(name, getattr(batch, name)) for name in batch._fields}
    )


def shard_params(params, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(
    batch: Seq2GeneBatch, mesh: Mesh, partition: str = "donor"
) -> Seq2GeneBatch:
    specs = batch_specs(batch, partition)
    vals = {}
    for name in batch._fields:
        leaf = getattr(batch, name)
        spec = getattr(specs, name)
        if leaf is not None:
            # device_put rejects uneven shards; replicate such leaves
            # instead (correct, just less parallel). pad_tissue_axis()
            # gives callers the evenly-sharded fast path.
            for i, axis in enumerate(spec):
                if axis is not None and leaf.shape[i] % mesh.shape[axis]:
                    key = (name, i, leaf.shape[i], mesh.shape[axis])
                    if key not in _UNEVEN_WARNED:  # once per shape, not per forward
                        _UNEVEN_WARNED.add(key)
                        import logging

                        logging.getLogger(__name__).warning(
                            "shard_batch: %s dim %d (%d) not divisible by "
                            "mesh axis %r (%d); replicating",
                            name, i, leaf.shape[i], axis, mesh.shape[axis],
                        )
                    spec = P()
                    break
        vals[name] = (
            None if leaf is None else jax.device_put(leaf, NamedSharding(mesh, spec))
        )
    return Seq2GeneBatch(**vals)


_UNEVEN_WARNED: set = set()


def pad_tissue_axis(
    batch: Seq2GeneBatch, mesh: Mesh, multiple: int | None = None
) -> tuple[Seq2GeneBatch, int]:
    """Pad every "tissue"-partition axis to a multiple of the "data" axis
    (or an explicit ``multiple`` — the fused tissue-DP path shards over ALL
    mesh axes jointly, so it passes the full device count) so
    ``shard_batch(partition="tissue")`` / ``shard_batch_tissue_all`` shard
    evenly rather than falling back to replication: ``tissue_ids``
    (repeating the last id) AND the CRE/gene window axes (zero windows — the
    same suffix-pad-beyond-count contract ``pack_samples`` already
    establishes; ``cre_count``/``gene_count`` keep masking them out).
    Returns the padded batch and the ORIGINAL tissue count — slice model
    outputs back to ``[:, :t]``; window padding never changes output
    shapes."""
    import jax.numpy as jnp

    t = batch.tissue_ids.shape[0]
    data = multiple if multiple is not None else mesh.shape["data"]
    pad_t = (-t) % data
    repl = {}
    if pad_t:
        repl["tissue_ids"] = jnp.concatenate(
            [batch.tissue_ids, jnp.repeat(batch.tissue_ids[-1:], pad_t)]
        )
    for tokens_name, len_name, extra in (
        ("cre_tokens", "cre_tok_len", "cre_labels"),
        ("gene_tokens", "gene_tok_len", None),
    ):
        n = getattr(batch, tokens_name).shape[1]
        pad = (-n) % data
        if pad == 0:
            continue
        for name in (tokens_name, len_name, extra):
            if name is None:
                continue
            leaf = getattr(batch, name)
            widths = [(0, 0), (0, pad)] + [(0, 0)] * (leaf.ndim - 2)
            repl[name] = jnp.pad(leaf, widths)
    return (batch._replace(**repl) if repl else batch), t


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh for DP+TP training: params follow
    ``param_specs``; optimizer-state leaves mirror the params tree (adam
    mu/nu etc. keep their param's sharding — ``param_specs`` keys off the
    trailing two path names, which the optax subtrees preserve), scalars
    replicate. The jitted train step then runs under GSPMD: XLA inserts the
    gradient all-reduce over "data" and the TP collectives over "model"
    from these shardings alone."""
    from variantformer_tpu.train.steps import TrainState

    params = shard_params(state.params, mesh)
    # param_specs only reads leaf .ndim and device_put takes numpy or jax
    # arrays directly — no intermediate full copy on the default device.
    opt_state = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state.opt_state,
        param_specs(state.opt_state),
    )
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(params, opt_state, step)


def shard_targets(targets, mesh: Mesh):
    """[D, ...] per-donor training targets/masks shard over "data"."""
    return jax.device_put(
        targets, NamedSharding(mesh, P("data", *([None] * (targets.ndim - 1))))
    )


def shard_step_args(args: tuple, mesh: Mesh) -> tuple:
    """Shard one train-step arg tuple: Seq2GeneBatch fields follow
    ``batch_specs``; bare arrays are per-donor/per-window leading-dim data
    and shard over "data"; python scalars (plateau value) pass through."""
    out = []
    for a in args:
        if isinstance(a, Seq2GeneBatch):
            out.append(shard_batch(a, mesh))
        elif getattr(a, "ndim", 0) >= 1:
            out.append(shard_targets(a, mesh))
        else:
            out.append(a)
    return tuple(out)


def sharded_forward(cfg, mesh: Mesh, impl: str = "xla"):
    """jit-compiled seq2gene forward with explicit input shardings."""
    from variantformer_tpu.models.seq2gene import seq2gene_forward

    def fn(params, batch):
        return seq2gene_forward(params, batch, cfg, impl=impl)

    return jax.jit(fn)


# -- donor-DP with the fused Pallas kernels ---------------------------------
#
# The fused whole-stack kernels (ops/fused_encoder, ops/fused_modulator) are
# single-chip programs: GSPMD cannot partition a pallas_call, so the plain
# sharded path downgrades them to layered XLA. But under pure donor data
# parallelism no partitioning is NEEDED — each chip runs the intact kernels
# on its own donor shard with replicated weights and zero collectives. We
# express exactly that with shard_map over ALL mesh axes jointly (a pure-DP
# program has no use for a separate "model" axis, so donors split across the
# full device set) and the fused forward as the per-device body.


def replicate_params(params, mesh: Mesh):
    """Place every param leaf fully replicated on the mesh (donor-DP needs
    whole weights on every chip — including ``gene_layers_packed``)."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), params)


def donor_dp_batch_specs(batch: Seq2GeneBatch, mesh: Mesh) -> Seq2GeneBatch:
    """Donor-leading arrays split over ALL mesh axes jointly; tissues
    replicate. The donor dim must divide the total device count — pad first
    (VCFProcessor._forward does)."""
    axes = tuple(mesh.axis_names)

    def spec(name, leaf):
        if leaf is None:
            return None
        if name == "tissue_ids" or "pool" in name:
            return P()  # dedup pools are donor-shared
        return P(axes, *([None] * (leaf.ndim - 1)))

    return Seq2GeneBatch(
        **{name: spec(name, getattr(batch, name)) for name in batch._fields}
    )


def shard_targets_donor_all(targets, mesh: Mesh):
    """[D, ...] per-donor targets/masks split over ALL mesh axes jointly
    (the donor-DP layout; see ``donor_dp_batch_specs``)."""
    axes = tuple(mesh.axis_names)
    return jax.device_put(
        targets,
        NamedSharding(mesh, P(axes, *([None] * (targets.ndim - 1)))),
    )


def shard_batch_donor_all(batch: Seq2GeneBatch, mesh: Mesh) -> Seq2GeneBatch:
    specs = donor_dp_batch_specs(batch, mesh)
    return Seq2GeneBatch(
        **{
            name: (
                None
                if getattr(batch, name) is None
                else jax.device_put(
                    getattr(batch, name), NamedSharding(mesh, getattr(specs, name))
                )
            )
            for name in batch._fields
        }
    )


def donor_dp_forward(cfg, mesh: Mesh, batch: Seq2GeneBatch, impl: str = "fused2"):
    """jitted shard_map forward keeping the fused kernels under the mesh.

    ``batch`` supplies the STRUCTURE (which optional fields are present);
    shapes are free — reuse the returned callable for any batch with the
    same field structure whose donor dim divides the device count.
    """
    from variantformer_tpu.models.seq2gene import seq2gene_forward

    axes = tuple(mesh.axis_names)
    specs = donor_dp_batch_specs(batch, mesh)

    def fwd(params, b):
        return seq2gene_forward(params, b, cfg, impl=impl)

    sm = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), specs),
        out_specs=P(axes),
        # the body holds pallas_calls whose varying-manual-axes inference
        # is unsupported; replication is structurally guaranteed here
        # (params replicated, outputs all donor-leading)
        check_vma=False,
    )
    return jax.jit(sm)


# -- tissue-DP with the fused Pallas kernels ---------------------------------
#
# Single-donor scale-out (genome-wide sweeps: one donor, a wide tissue list).
# Tissues never interact in the gene stack, and the window encoder is
# embarrassingly parallel over WINDOWS — so the fused kernels survive this
# mesh too:
#   * the CRE/gene WINDOW axes shard over all mesh axes jointly; each chip
#     runs the intact fused window encoder on its window shard, then
#     all-gathers the embeddings (~3.6 MB at full geometry),
#   * the TISSUE axis shards over all mesh axes jointly; each chip runs the
#     intact fused gene modulator on its tissue shard (CRE stack replicates —
#     ~3% of FLOPs),
#   * outputs are tissue-leading shards, reassembled by shard_map.
# Per-chip work at N devices ≈ (encoder + modulator)/N + CRE stack, vs the
# GSPMD fallback's layered-XLA rate (~40% of fused MFU).


def tissue_dp_batch_specs(batch: Seq2GeneBatch, mesh: Mesh) -> Seq2GeneBatch:
    """Window axes + tissue axis split over ALL mesh axes jointly; counts,
    labels, and token positions replicate (they index GLOBAL window axes).
    Pad first with ``pad_tissue_axis(batch, mesh, multiple=n_devices)``."""
    axes = tuple(mesh.axis_names)

    def spec(name, leaf):
        if leaf is None:
            return None
        if name == "tissue_ids":
            return P(axes)
        if name in ("cre_tokens", "gene_tokens"):
            return P(None, axes, None)
        if name in ("cre_tok_len", "gene_tok_len"):
            return P(None, axes)
        return P(*([None] * leaf.ndim))

    return Seq2GeneBatch(
        **{name: spec(name, getattr(batch, name)) for name in batch._fields}
    )


def shard_batch_tissue_all(batch: Seq2GeneBatch, mesh: Mesh) -> Seq2GeneBatch:
    specs = tissue_dp_batch_specs(batch, mesh)
    return Seq2GeneBatch(
        **{
            name: (
                None
                if getattr(batch, name) is None
                else jax.device_put(
                    getattr(batch, name), NamedSharding(mesh, getattr(specs, name))
                )
            )
            for name in batch._fields
        }
    )


def tissue_dp_forward(cfg, mesh: Mesh, batch: Seq2GeneBatch, impl: str = "fused2"):
    """jitted shard_map forward keeping the fused kernels under a TISSUE
    partition (see module comment above). ``batch`` supplies the STRUCTURE;
    reuse the callable for same-structure batches whose tissue and window
    axes divide the device count (``pad_tissue_axis(..., multiple=n)``)."""
    from variantformer_tpu.models.seq2gene import Seq2GeneOutput, seq2gene_forward

    axes = tuple(mesh.axis_names)
    specs = tissue_dp_batch_specs(batch, mesh)

    def fwd(params, b):
        return seq2gene_forward(
            params, b, cfg, impl=impl, window_gather_axes=axes
        )

    out_specs = Seq2GeneOutput(
        pred_expression=P(None, axes),
        pooled_embedding=P(None, axes, None),
        gene_token_embedding=P(None, axes, None),
        cre_token_embedding=P(None, axes, None),
    )
    sm = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), specs),
        out_specs=out_specs,
        # pallas_call varying-manual-axes inference is unsupported; the
        # layout is structurally correct (params replicated, windows/tissues
        # sharded, explicit all_gather inside)
        check_vma=False,
    )
    return jax.jit(sm)


def opt_state_specs(opt_state, mesh: Mesh):
    """ZeRO-1 PartitionSpec tree for an optimizer state: each array leaf's
    largest axis divisible by the device count shards over ALL mesh axes;
    scalars and indivisible leaves replicate.

    Why: at full geometry the model is 1.207 B params — f32 Adam m+v alone
    is 9 GB and cannot share a 16 GB v5e with params+grads+activations
    (scripts/full_train_probe.py). Donor-DP replicates params but nothing
    requires the OPTIMIZER state to replicate: sharding m/v over N devices
    cuts the state to 9/N GB, the elementwise update runs where the state
    lives, and one all-gather per step rebuilds the replicated params
    (GSPMD inserts it from the sharding constraint)."""
    n = len(mesh.devices.reshape(-1))
    axes = tuple(mesh.axis_names)

    def spec(leaf) -> P:
        ndim = getattr(leaf, "ndim", 0)
        if not ndim:
            return P()
        best, best_size = None, 0
        for i, s in enumerate(leaf.shape):
            if s % n == 0 and s > best_size:
                best, best_size = i, s
        if best is None:
            return P()
        parts: list = [None] * ndim
        parts[best] = axes
        return P(*parts)

    return jax.tree.map(spec, opt_state)


def shard_opt_state(opt_state, mesh: Mesh):
    """Place an optimizer state ZeRO-1 sharded (see ``opt_state_specs``)."""
    specs = opt_state_specs(opt_state, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        opt_state, specs,
    )


def donor_dp_train_step(
    cfg, mesh: Mesh, tx, batch: Seq2GeneBatch, impl: str = "fused",
    freeze_tokenizers: bool = False, train_gene_tokenizer: bool = True,
    plateau: str = "epoch", shard_optimizer: bool = False,
):
    """Donor-DP TRAINING with the fused Pallas kernels intact per device.

    The GSPMD path (``shard_train_state`` + the plain step) cannot partition
    a pallas_call, so fused training would downgrade to layered XLA the
    moment it is sharded. Under pure donor DP nothing needs partitioning:
    each device runs the fused forward AND its recompute Pallas backward
    (ops/fused_encoder.py custom VJP) on its own donor shard with replicated
    params, and the only collectives are the gradient psums this function
    inserts explicitly.

    Exact-parity contract with the single-device step: the device-local
    gradient is d(sum of local masked losses); psum across all mesh axes
    plus division by the global mask count reproduces the global mean-loss
    gradient, so losses and updated params match ``make_seq2gene_train_step``
    bit-for-reassociation. ``batch`` supplies the field STRUCTURE (reuse the
    step for any same-structure batch whose donor dim divides the device
    count); ``impl`` may be "xla", "fused" (encoder VJP) or "fused2"
    (encoder + gene-modulator VJPs).

    ``shard_optimizer=True`` keeps the optimizer state ZeRO-1 sharded
    (``shard_opt_state`` the initial state first): the elementwise update
    runs on each leaf's shard and the params re-replicate via one
    all-gather. Numerics are identical — the update is elementwise, so
    sharding only partitions it.
    """
    import optax

    from variantformer_tpu.train.steps import TrainState

    assert plateau in ("step", "epoch")
    vg = donor_dp_value_and_grad(
        cfg, mesh, batch, impl=impl, freeze_tokenizers=freeze_tokenizers,
        train_gene_tokenizer=train_gene_tokenizer,
    )
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(state: "TrainState", b, targets, mask, plateau_value=None):
        loss, grads = vg(state.params, b, targets, mask)
        if plateau_value is None:
            plateau_value = loss if plateau == "step" else 1.0
        # grads/loss leave the shard_map replicated, so the optimizer update
        # is an ordinary jitted op (identical on every device) — unless the
        # state is ZeRO-1 sharded, in which case GSPMD partitions the
        # update to the state's layout and all-gathers the params.
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params, value=plateau_value
        )
        params = optax.apply_updates(state.params, updates)
        if shard_optimizer:
            sspecs = opt_state_specs(opt_state, mesh)
            opt_state = jax.tree.map(
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, s)
                ),
                opt_state, sspecs,
            )
            params = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, repl), params
            )
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def replicate_train_state(state, mesh: Mesh):
    """Place a TrainState fully replicated (the donor-DP training layout:
    params and optimizer state are identical on every device; only the
    batch shards)."""
    from variantformer_tpu.train.steps import TrainState

    repl = NamedSharding(mesh, P())
    place = lambda t: jax.tree.map(lambda x: jax.device_put(x, repl), t)
    return TrainState(
        place(state.params), place(state.opt_state), place(state.step)
    )


def donor_dp_shard_fn(mesh: Mesh):
    """Per-batch placement for ``train.loop.fit(shard_fn=...)`` under
    donor-DP: Seq2GeneBatch fields split donor-leading over ALL mesh axes,
    bare arrays (targets/masks) likewise, scalars pass through. Pair with
    ``donor_dp_train_step`` and ``replicate_train_state``."""

    def fn(args: tuple) -> tuple:
        out = []
        for a in args:
            if isinstance(a, Seq2GeneBatch):
                out.append(shard_batch_donor_all(a, mesh))
            elif getattr(a, "ndim", 0) >= 1:
                out.append(shard_targets_donor_all(a, mesh))
            else:
                out.append(a)
        return tuple(out)

    return fn


def donor_dp_value_and_grad(
    cfg, mesh: Mesh, batch: Seq2GeneBatch, impl: str = "fused",
    freeze_tokenizers: bool = False, train_gene_tokenizer: bool = True,
):
    """jitted (params, batch, targets, mask) -> (loss, grads) under donor-DP
    shard_map: the device-local gradient of the local masked-loss SUM, psum'd
    across all mesh axes and divided by the global mask count — exactly the
    single-device mean-loss gradient. Outputs replicate."""
    import jax.numpy as jnp

    from variantformer_tpu.models.seq2gene import seq2gene_forward
    from variantformer_tpu.train import losses as L

    if impl not in ("xla", "fused", "fused2"):
        raise ValueError(
            f"training impl must be 'xla', 'fused' or 'fused2', got {impl!r}"
        )
    axes = tuple(mesh.axis_names)
    specs = donor_dp_batch_specs(batch, mesh)
    tspec = P(axes)

    def local_sum_loss(params, b, targets, mask):
        if impl == "fused2" and "gene_layers_packed" in params:
            # Packed weights would shadow gene_layers on the forward and
            # receive the gradient instead; training params must carry the
            # raw tree only (the diff path packs inline).
            raise ValueError(
                "fused2 training params must not contain 'gene_layers_packed'"
            )
        if freeze_tokenizers:
            params = dict(params)
            params["cre_tokenizer"] = jax.lax.stop_gradient(
                params["cre_tokenizer"]
            )
            if not train_gene_tokenizer:
                params["gene_tokenizer"] = jax.lax.stop_gradient(
                    params["gene_tokenizer"]
                )
        out = seq2gene_forward(params, b, cfg, impl=impl)
        if cfg.seq2gene.loss_fn == "poisson":
            elem = L.poisson_nll(out.pred_expression, targets)
        else:
            elem = L.mse(out.pred_expression, targets)
        elem = jnp.where(mask, elem, 0.0)
        return elem.sum(), mask.sum()

    def body(params, b, targets, mask):
        (s, c), grads = jax.value_and_grad(local_sum_loss, has_aux=True)(
            params, b, targets, mask
        )
        s = jax.lax.psum(s, axes)
        c = jax.lax.psum(jnp.asarray(c, jnp.float32), axes)
        denom = jnp.maximum(c, 1.0)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axes) / denom, grads)
        return s / denom, grads

    sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), specs, tspec, tspec),
        out_specs=(P(), P()),
        check_vma=False,  # same pallas_call caveat as donor_dp_forward
    )
    return jax.jit(sm)
