"""Multi-chip correctness: sharded forward must MATCH the single-device one.

Round-1 multi-chip evidence was "tiny model produces finite numbers"; these
tests assert numerical parity instead, on the 8-device CPU mesh
(tests/conftest.py) with real pjit DP+TP partitioning:

  * 2x4 ("data", "model") mesh at near-real geometry — the REAL 32-head
    count, so the 4-way "model" shard is exact head parallelism — against
    the unsharded single-device forward at ~1e-5,
  * a 2-process ``jax.distributed`` CPU integration run of
    scripts/launch_genome_wide.py with a localhost coordinator.

The reference has no distributed counterpart (SURVEY.md §2.3); the
single-device semantics are the correctness contract.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from variantformer_tpu.config import (
    ModelConfig,
    PrecisionPolicy,
    Seq2GeneConfig,
    WindowEncoderConfig,
)
from variantformer_tpu.models.init import init_seq2gene
from variantformer_tpu.models.seq2gene import seq2gene_forward
from variantformer_tpu.parallel import mesh as pmesh

from __graft_entry__ import _example_batch

REPO = Path(__file__).resolve().parent.parent


from __graft_entry__ import near_real_cfg as _near_real_cfg  # noqa: E402


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.slow  # covered by the driver's dryrun_multichip gate
def test_sharded_forward_matches_single_device():
    cfg = _near_real_cfg()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = _example_batch(d=4, c=12, g=6, length=12, t=5, vocab=64)

    single = seq2gene_forward(params, batch, cfg)

    m = pmesh.make_mesh(devices=jax.devices()[:8])
    assert dict(m.shape) == {"data": 2, "model": 4}
    sharded_out = pmesh.sharded_forward(cfg, m)(
        pmesh.shard_params(params, m), pmesh.shard_batch(batch, m)
    )

    for name in single._fields:
        if getattr(single, name) is None:  # optional stream outputs
            continue
        np.testing.assert_allclose(
            np.asarray(getattr(sharded_out, name)),
            np.asarray(getattr(single, name)),
            rtol=2e-5, atol=2e-5, err_msg=name,
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.slow  # covered by the driver's dryrun_multichip gate
def test_sharded_train_step_matches_single_device():
    """DP+TP TRAINING parity: two optimizer steps on the 2x4 mesh must
    reproduce the single-device trajectory (loss and updated params) — the
    gradient all-reduce over "data" and the TP collectives over "model" are
    inserted by GSPMD from the shardings alone."""
    import jax.numpy as jnp

    from variantformer_tpu.train.optimizer import make_optimizer
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    cfg = _near_real_cfg()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = _example_batch(d=4, c=12, g=6, length=12, t=5, vocab=64)
    rng = np.random.default_rng(3)
    targets = jnp.asarray(rng.uniform(0, 3, (4, 5)), jnp.float32)
    mask = jnp.ones((4, 5), bool)

    tx = make_optimizer(
        params, learning_rate=1e-3, weight_decay=0.01, optimizer="adamw",
        plateau="epoch",
    )
    step = make_seq2gene_train_step(cfg, tx)

    def run_two(state, batch, targets, mask):
        losses = []
        for _ in range(2):
            state, loss = step(state, batch, targets, mask, 1.0)
            losses.append(float(loss))
        return state, losses

    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    single, losses_single = run_two(state, batch, targets, mask)

    m = pmesh.make_mesh(devices=jax.devices()[:8])
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    sharded, losses_sharded = run_two(
        pmesh.shard_train_state(state, m),
        pmesh.shard_batch(batch, m),
        pmesh.shard_targets(targets, m),
        pmesh.shard_targets(mask, m),
    )

    np.testing.assert_allclose(losses_sharded, losses_single, rtol=2e-5)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(single.params)
    flat_m = jax.tree.leaves(sharded.params)
    for (path, a), b in zip(flat_s, flat_m):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_launcher(tmp_path):
    """Two jax.distributed processes coordinate over localhost, split the
    gene list, and each writes its own shard + stats."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local device per process

    procs = []
    for pid in range(2):
        out = tmp_path / f"proc{pid}"
        procs.append(
            (
                out,
                subprocess.Popen(
                    [
                        sys.executable,
                        str(REPO / "scripts" / "launch_genome_wide.py"),
                        "--synthetic", "--platform", "cpu",
                        "--tissues", "tissue0",
                        "--out", str(out),
                        "--coordinator", f"127.0.0.1:{port}",
                        "--num-processes", "2", "--process-id", str(pid),
                    ],
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    text=True, env=env, cwd=REPO,
                ),
            )
        )

    outputs = []
    for _, p in procs:
        try:
            out_text, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for _, q in procs:
                q.kill()
            raise
        outputs.append(out_text)
    for (_, p), text in zip(procs, outputs):
        assert p.returncode == 0, text[-2000:]

    stats = []
    for pid, (out, _) in enumerate(procs):
        path = out / f"host_{pid:03d}" / "stats.json"
        assert path.exists(), outputs[pid][-2000:]
        stats.append(json.loads(path.read_text()))
    # Distributed init must have actually split the 2-gene synthetic set —
    # a silent single-process fallback would give each process both genes.
    assert [s["genes"] for s in stats] == [1, 1]


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    """TRUE multi-host data-parallel training: two jax.distributed processes
    share one global mesh, each contributes its donors to every global batch,
    and GSPMD all-reduces the gradients — verified by lockstep with a
    single-process run over the same shards (same global batches in the same
    order => same loss trajectory)."""
    rng = np.random.default_rng(0)
    shards = tmp_path / "shards"
    shards.mkdir()
    for i in range(4):
        np.savez(
            shards / f"GENE{i}.1__D1.npz",
            cre_tokens=rng.integers(4, 64, (4, 8)).astype(np.int32),
            cre_tok_len=np.full(4, 8, np.int32),
            cre_labels=rng.integers(0, 9, 4).astype(np.int32),
            gene_tokens=rng.integers(4, 64, (3, 8)).astype(np.int32),
            gene_tok_len=np.full(3, 8, np.int32),
            strand=np.int32(0),
            tissue_ids=np.asarray([0, 2], np.int32),
            targets=np.asarray([1.0 + i, 0.5], np.float32),
        )

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local device per process

    def launch(num_processes: int, out: Path):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [
                    sys.executable, str(REPO / "scripts" / "launch_train.py"),
                    "--shards", str(shards), "--tissue-ids", "0,2",
                    "--epochs", "2", "--global-batch", "2",
                    "--lr", "1e-3", "--tiny-model", "--no-shuffle",
                    "--platform", "cpu", "--out", str(out),
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", str(num_processes),
                    "--process-id", str(pid),
                ],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=REPO,
            )
            for pid in range(num_processes)
        ]
        outputs = []
        for p in procs:
            try:
                text, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outputs.append(text)
        for p, text in zip(procs, outputs):
            assert p.returncode == 0, text[-2000:]
        hist = json.loads(
            (out / "host_000" / "history.json").read_text()
        )["epochs"]
        return hist, outputs

    single, _ = launch(1, tmp_path / "single")
    double, outputs = launch(2, tmp_path / "double")
    assert len(single) == len(double) == 2
    for a, b in zip(single, double):
        # same global batches in the same order; only the cross-device
        # reduction order differs
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=2e-5), (
            outputs[0][-1500:]
        )
    # training moved: epoch 1 improves on epoch 0
    assert double[1]["train_loss"] < double[0]["train_loss"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.mid
def test_use_mesh_sweep_matches_single_device(tmp_path):
    """VCFProcessor.use_mesh scales the whole API across the mesh: a
    genome-wide sweep under DP+TP must reproduce single-device predictions,
    including a final short batch (donor padding on the data axis)."""
    sys.path.insert(0, str(REPO / "examples"))
    from _common import synthetic_env

    from variantformer_tpu.api.sweeps import genome_wide_expression
    from variantformer_tpu.api.vcfprocessor import VCFProcessor

    import dataclasses

    sources, cfg, extras = synthetic_env(str(tmp_path / "env"))
    cfg = dataclasses.replace(
        cfg, precision=PrecisionPolicy(compute_dtype="float32")
    )

    def run(meshed):
        proc = VCFProcessor(sources=sources, config=cfg, impl="xla")
        proc.set_params(init_seq2gene(jax.random.key(0), cfg))
        if meshed:
            proc.use_mesh(pmesh.make_mesh(devices=jax.devices()[:8]))
        names = list(proc.tissue_vocab)[:3]
        # A 3-donor group on a data axis of 2 forces the suffix-padding +
        # output-slicing path in _forward (the synthetic env has only two
        # genes, so request one twice to get an odd batch).
        genes = ["GENE1.1", "GENE2.1", "GENE1.1"]
        df = genome_wide_expression(
            proc, extras["vcf"], names, genes=genes, batch_size=3
        )
        # collapse the duplicate gene rows (identical predictions)
        df = df.drop_duplicates(["gene_id", "tissue"])
        return df.sort_values(["gene_id", "tissue"]).reset_index(drop=True)

    base = run(meshed=False)
    meshed = run(meshed=True)
    assert list(base["gene_id"]) == list(meshed["gene_id"])
    np.testing.assert_allclose(
        base["predicted_expression"].to_numpy(),
        meshed["predicted_expression"].to_numpy(),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.slow  # covered by the driver's dryrun_multichip gate
def test_donor_dp_fused_forward_matches_single_device():
    """Donor-DP via shard_map keeps the fused Pallas kernels intact per
    device (interpreter mode on the CPU mesh): donors split over ALL 8
    devices with replicated packed weights and zero collectives. Contract:
    match the single-device fused2 forward — the kernels are bf16-internal,
    so the only sharding-induced difference is window-block reassociation
    (~5e-5 observed; fused-vs-XLA itself is ~6e-4, tests/test_fused_modulator
    covers that)."""
    from variantformer_tpu.ops.fused_modulator import pack_gene_layers

    cfg = _near_real_cfg()
    mcfg = cfg.seq2gene
    params = init_seq2gene(jax.random.key(0), cfg)
    params["gene_layers_packed"] = pack_gene_layers(
        params["gene_layers"], mcfg.num_heads, mcfg.emb_dim // mcfg.num_heads
    )
    batch = _example_batch(d=8, c=12, g=6, length=12, t=6, vocab=64)

    single = seq2gene_forward(params, batch, cfg, impl="fused2")

    m = pmesh.make_mesh(devices=jax.devices()[:8])
    repl = pmesh.replicate_params(params, m)
    b = pmesh.shard_batch_donor_all(batch, m)
    out = pmesh.donor_dp_forward(cfg, m, b, impl="fused2")(repl, b)

    for name in single._fields:
        if getattr(single, name) is None:  # optional stream outputs
            continue
        # embeddings leave the kernel in bf16 — the shard split moves window
        # blocks, so they can differ by a couple of bf16 ulps (~2^-6 around
        # |x|~2); the f32 prediction head is the tight contract.
        tol = dict(rtol=5e-4, atol=5e-4) if name == "pred_expression" else dict(
            rtol=1e-2, atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(single, name)),
            err_msg=name, **tol,
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.slow
def test_donor_dp_fused_train_step_matches_single_device():
    """Donor-DP TRAINING with the fused encoder VJP intact per device: two
    optimizer steps on the 8-device mesh (shard_map, explicit grad psums)
    must reproduce the single-device impl='fused' trajectory. This is the
    training counterpart of the fused-forward mesh survival — without it,
    sharded training forfeits both the fused forward AND the Pallas
    backward."""
    import jax.numpy as jnp

    from variantformer_tpu.train.optimizer import make_optimizer
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    cfg = _near_real_cfg()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = _example_batch(d=8, c=12, g=6, length=12, t=5, vocab=64)
    rng = np.random.default_rng(5)
    targets = jnp.asarray(rng.uniform(0, 3, (8, 5)), jnp.float32)
    mask = jnp.ones((8, 5), bool)

    def make_tx():
        return make_optimizer(
            params, learning_rate=1e-3, weight_decay=0.01, optimizer="adamw",
            plateau="epoch", train_gene_tokenizer=True,
        )

    tx = make_tx()
    step = make_seq2gene_train_step(
        cfg, tx, impl="fused", train_gene_tokenizer=True
    )
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    losses_single = []
    for _ in range(2):
        state, loss = step(state, batch, targets, mask, 1.0)
        losses_single.append(float(loss))
    single = state

    m = pmesh.make_mesh(devices=jax.devices()[:8])
    tx2 = make_tx()
    dstep = pmesh.donor_dp_train_step(cfg, m, tx2, batch, impl="fused")
    state = TrainState(
        pmesh.replicate_params(params, m),
        jax.tree.map(
            lambda x: jax.device_put(
                x, jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec())
            ),
            tx2.init(params),
        ),
        jnp.zeros((), jnp.int32),
    )
    b = pmesh.shard_batch_donor_all(batch, m)
    t = pmesh.shard_targets_donor_all(targets, m)
    mk = pmesh.shard_targets_donor_all(mask, m)
    losses_dp = []
    for _ in range(2):
        state, loss = dstep(state, b, t, mk, 1.0)
        losses_dp.append(float(loss))

    # Loss trajectory: tight. Params after Adam steps are NOT compared
    # tightly — the fused kernels are bf16-internal and the donor split
    # regroups window blocks (forward differs ~5e-4), and Adam's g/sqrt(v)
    # rescales sub-noise gradient entries to full-lr sign flips on
    # zero-init leaves (LN biases). The distributed-correctness contract is
    # the GRADIENT, which is linear in that noise — asserted below.
    np.testing.assert_allclose(losses_dp, losses_single, rtol=1e-3)

    # Gradient parity: distributed psum'd grads == single-device grads of
    # the same fused loss, per-leaf relative L2.
    import jax.numpy as jnp2  # noqa: F401  (jnp already imported above)
    from variantformer_tpu.train.steps import seq2gene_loss_fn

    g_single = jax.grad(
        lambda p: seq2gene_loss_fn(p, batch, targets, mask, cfg, impl="fused")
    )(params)
    vg = pmesh.donor_dp_value_and_grad(cfg, m, batch, impl="fused")
    loss_dp, g_dp = vg(pmesh.replicate_params(params, m), b, t, mk)
    single_loss = float(
        seq2gene_loss_fn(params, batch, targets, mask, cfg, impl="fused")
    )
    np.testing.assert_allclose(float(loss_dp), single_loss, rtol=1e-3)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_single)
    flat_m = jax.tree.leaves(g_dp)
    for (path, a), bb in zip(flat_s, flat_m):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        denom = max(1e-6, float(np.linalg.norm(a)))
        rel = np.linalg.norm(bb - a) / denom
        assert rel < 5e-3, f"{jax.tree_util.keystr(path)}: grad rel L2 {rel}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.mid
def test_use_mesh_keeps_fused_kernels_donor_partition(tmp_path):
    """use_mesh(partition="donor") on a fused2 processor must KEEP the fused
    kernels (round-2 downgraded every meshed forward to XLA): impl stays
    fused2, an odd donor count pads to the full device count, and predictions
    match the unmeshed fused2 processor. Also exercises the re-mesh
    transitions: donor(fused) -> tissue(xla) -> donor(fused restored)."""
    sys.path.insert(0, str(REPO / "examples"))
    import dataclasses

    from _common import synthetic_env

    from variantformer_tpu.api.sweeps import genome_wide_expression
    from variantformer_tpu.api.vcfprocessor import VCFProcessor

    sources, cfg, extras = synthetic_env(str(tmp_path / "env"))
    cfg = dataclasses.replace(
        cfg, precision=PrecisionPolicy(compute_dtype="float32")
    )

    def run(meshed):
        proc = VCFProcessor(sources=sources, config=cfg, impl="fused2")
        proc.set_params(init_seq2gene(jax.random.key(0), cfg))
        if meshed:
            proc.use_mesh(pmesh.make_mesh(devices=jax.devices()[:8]))
            assert proc.impl == "fused2", "donor mesh must keep fused kernels"
            assert "gene_layers_packed" in proc._params
        names = list(proc.tissue_vocab)[:3]
        # 3 donors on 8 devices forces the pad-to-device-count + slice path.
        genes = ["GENE1.1", "GENE2.1", "GENE1.1"]
        df = genome_wide_expression(
            proc, extras["vcf"], names, genes=genes, batch_size=3
        )
        df = df.drop_duplicates(["gene_id", "tissue"])
        out = df.sort_values(["gene_id", "tissue"]).reset_index(drop=True)
        return proc, out

    _, base = run(meshed=False)
    proc, meshed = run(meshed=True)
    assert list(base["gene_id"]) == list(meshed["gene_id"])
    np.testing.assert_allclose(
        meshed["predicted_expression"].to_numpy(),
        base["predicted_expression"].to_numpy(),
        rtol=5e-4, atol=5e-4,
    )

    # tissue re-mesh keeps the fused kernels too (round-4: the shard_map
    # tissue-DP program); donor re-mesh and reset stay fused2
    m = pmesh.make_mesh(devices=jax.devices()[:8])
    proc.use_mesh(m, partition="tissue")
    assert proc.impl == "fused2" and proc._mesh_fused
    assert "gene_layers_packed" in proc._params
    proc.use_mesh(m, partition="donor")
    assert proc.impl == "fused2"
    assert "gene_layers_packed" in proc._params
    proc._reset_mesh()
    assert proc.impl == "fused2"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.mid
def test_tissue_sharded_forward_matches_single_device():
    """partition="tissue" (single-donor scale-out): the tissue fan-out and
    the window axes shard over "data" instead of donors; output must still
    match the unsharded forward. Odd T (5) exercises pad_tissue_axis; D=1
    is the motivating workload (one donor, mesh full)."""
    cfg = _near_real_cfg()
    params = init_seq2gene(jax.random.key(0), cfg)
    # Odd C/G/T so pad_tissue_axis must pad ALL partition axes (window
    # padding rides the count-mask contract; outputs stay [D, T]-sliceable).
    batch = _example_batch(d=1, c=13, g=7, length=12, t=5, vocab=64)

    single = seq2gene_forward(params, batch, cfg)

    m = pmesh.make_mesh(devices=jax.devices()[:8])
    padded, t = pmesh.pad_tissue_axis(batch, m)
    assert t == 5 and padded.tissue_ids.shape[0] == 6  # data axis = 2
    assert padded.cre_tokens.shape[1] == 14
    assert padded.gene_tokens.shape[1] == 8
    sharded_out = pmesh.sharded_forward(cfg, m)(
        pmesh.shard_params(params, m),
        pmesh.shard_batch(padded, m, partition="tissue"),
    )

    for name in single._fields:
        if getattr(single, name) is None:  # optional stream outputs
            continue
        np.testing.assert_allclose(
            np.asarray(getattr(sharded_out, name))[:, :t],
            np.asarray(getattr(single, name)),
            rtol=2e-5, atol=2e-5, err_msg=name,
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_use_mesh_tissue_partition_matches_single_device(tmp_path):
    """use_mesh(partition="tissue") through the full API: single-donor
    predictions over an odd tissue count (3, padded to the data axis and
    sliced back) must match the unmeshed processor."""
    sys.path.insert(0, str(REPO / "examples"))
    import dataclasses

    import pandas as pd
    from _common import synthetic_env

    from variantformer_tpu.api.vcfprocessor import VCFProcessor

    sources, cfg, extras = synthetic_env(str(tmp_path / "env"))
    cfg = dataclasses.replace(
        cfg, precision=PrecisionPolicy(compute_dtype="float32")
    )

    def run(meshed):
        proc = VCFProcessor(sources=sources, config=cfg, impl="xla")
        proc.set_params(init_seq2gene(jax.random.key(0), cfg))
        if meshed:
            proc.use_mesh(
                pmesh.make_mesh(devices=jax.devices()[:8]),
                partition="tissue",
            )
        names = list(proc.tissue_vocab)[:3]
        query = pd.DataFrame(
            {"gene_id": ["GENE1.1"], "tissues": [",".join(names)]}
        )
        return proc.predict(extras["vcf"], query)

    base = run(meshed=False)
    meshed = run(meshed=True)
    np.testing.assert_allclose(
        np.asarray(list(meshed["predicted_expression"])[0], float),
        np.asarray(list(base["predicted_expression"])[0], float),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.slow
def test_fit_loop_with_donor_dp_fused_step():
    """The high-level fit loop drives donor-DP fused training end to end:
    step_fn=donor_dp_train_step, state replicated, batches placed by
    donor_dp_shard_fn. Loss must track the single-device fused fit."""
    import jax.numpy as jnp

    from variantformer_tpu.train.loop import fit
    from variantformer_tpu.train.optimizer import make_optimizer
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    cfg = _near_real_cfg()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = _example_batch(d=8, c=12, g=6, length=12, t=5, vocab=64)
    rng = np.random.default_rng(9)
    targets = jnp.asarray(rng.uniform(0, 3, (8, 5)), jnp.float32)
    mask = jnp.ones((8, 5), bool)

    def batches(_epoch):
        return [(batch, targets, mask)]

    def make_state(tx):
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    tx = make_optimizer(params, learning_rate=1e-3, plateau="epoch")
    single = fit(
        make_state(tx),
        make_seq2gene_train_step(cfg, tx, impl="fused"),
        batches, epochs=2,
    )

    m = pmesh.make_mesh(devices=jax.devices()[:8])
    tx2 = make_optimizer(params, learning_rate=1e-3, plateau="epoch")
    dp = fit(
        pmesh.replicate_train_state(make_state(tx2), m),
        pmesh.donor_dp_train_step(cfg, m, tx2, batch, impl="fused"),
        batches, epochs=2,
        shard_fn=pmesh.donor_dp_shard_fn(m),
    )
    for a, b in zip(single.history, dp.history):
        np.testing.assert_allclose(b["train_loss"], a["train_loss"], rtol=1e-3)
    assert dp.history[-1]["train_loss"] < dp.history[0]["train_loss"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.slow  # covered by the driver's dryrun_multichip gate
def test_tissue_dp_fused_forward_matches_single_device():
    """Tissue-DP via shard_map keeps the fused Pallas kernels intact per
    device: the WINDOW axes shard across all 8 devices for the encoder
    (embeddings all-gathered), and each device runs the fused modulator on
    its TISSUE shard. Single-donor genome-sweep layout (d=1, wide tissue
    list). Contract: match the single-device fused2 forward."""
    from variantformer_tpu.ops.fused_modulator import pack_gene_layers

    cfg = _near_real_cfg()
    mcfg = cfg.seq2gene
    params = init_seq2gene(jax.random.key(0), cfg)
    params["gene_layers_packed"] = pack_gene_layers(
        params["gene_layers"], mcfg.num_heads, mcfg.emb_dim // mcfg.num_heads
    )
    # window axes divisible by 8 after pad_tissue_axis; tissue list NOT a
    # multiple of 8 to exercise the padding path
    batch = _example_batch(d=1, c=16, g=8, length=12, t=6, vocab=64)

    single = seq2gene_forward(params, batch, cfg, impl="fused2")

    m = pmesh.make_mesh(devices=jax.devices()[:8])
    repl = pmesh.replicate_params(params, m)
    padded, t0 = pmesh.pad_tissue_axis(batch, m, multiple=m.devices.size)
    assert padded.tissue_ids.shape[0] == 8 and t0 == 6
    b = pmesh.shard_batch_tissue_all(padded, m)
    out = pmesh.tissue_dp_forward(cfg, m, b, impl="fused2")(repl, b)
    out = type(out)(*(leaf[:, :t0] for leaf in out))

    for name in single._fields:
        if getattr(single, name) is None:  # optional stream outputs
            continue
        tol = dict(rtol=5e-4, atol=5e-4) if name == "pred_expression" else dict(
            rtol=1e-2, atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(single, name)),
            err_msg=name, **tol,
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
@pytest.mark.mid
def test_use_mesh_keeps_fused_kernels_tissue_partition(tmp_path):
    """VCFProcessor.use_mesh(partition='tissue') with a fused impl must KEEP
    the fused kernels (round-3 downgraded every tissue-meshed forward to
    layered XLA at ~40% of the fused rate) and produce the unmeshed
    predictions."""
    sys.path.insert(0, str(REPO / "examples"))
    import dataclasses

    from _common import synthetic_env

    from variantformer_tpu.api.vcfprocessor import VCFProcessor

    import pandas as pd

    sources, cfg, extras = synthetic_env(str(tmp_path / "env"))
    cfg = dataclasses.replace(
        cfg, precision=PrecisionPolicy(compute_dtype="float32")
    )

    def run(meshed):
        proc = VCFProcessor(sources=sources, config=cfg, impl="fused2")
        proc.set_params(init_seq2gene(jax.random.key(0), cfg))
        if meshed:
            proc.use_mesh(pmesh.make_mesh(devices=jax.devices()[:8]),
                          partition="tissue")
            assert proc._mesh_fused and proc.impl == "fused2", (
                "tissue mesh must keep the fused kernels")
        tissues = ",".join(list(proc.tissue_vocab)[:3])  # odd T -> padding
        q = pd.DataFrame({"gene_id": ["GENE1.1"], "tissues": [tissues]})
        return proc.predict(extras["vcf"], q, batch_size=1)

    base = run(meshed=False)
    meshed = run(meshed=True)
    np.testing.assert_allclose(
        np.stack(meshed["predicted_expression"].to_numpy()),
        np.stack(base["predicted_expression"].to_numpy()),
        rtol=5e-4, atol=5e-4,
    )


@pytest.mark.mid
def test_zero1_sharded_optimizer_matches_replicated():
    """ZeRO-1 optimizer-state sharding (opt_state_specs/shard_opt_state +
    donor_dp_train_step(shard_optimizer=True)): the elementwise Adam update
    partitioned to the state's shards plus one param all-gather must
    reproduce the replicated-state trajectory exactly, while m/v actually
    live sharded (the full-geometry motivation: f32 Adam m+v is 9 GB —
    scripts/full_train_probe.py — and replicating it caps single-chip
    training; sharded it is 9/N GB)."""
    import jax.numpy as jnp

    from variantformer_tpu.train.optimizer import make_optimizer
    from variantformer_tpu.train.steps import TrainState

    cfg = _near_real_cfg()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = _example_batch(d=8, c=12, g=6, length=12, t=5, vocab=64)
    rng = np.random.default_rng(7)
    targets = jnp.asarray(rng.uniform(0, 3, (8, 5)), jnp.float32)
    mask = jnp.ones((8, 5), bool)
    m = pmesh.make_mesh(devices=jax.devices()[:8])
    b = pmesh.shard_batch_donor_all(batch, m)
    t = pmesh.shard_targets_donor_all(targets, m)
    mk = pmesh.shard_targets_donor_all(mask, m)

    def run(shard_optimizer):
        tx = make_optimizer(
            params, learning_rate=1e-3, weight_decay=0.01, optimizer="adamw",
            plateau="epoch", train_gene_tokenizer=True,
        )
        dstep = pmesh.donor_dp_train_step(
            cfg, m, tx, batch, impl="xla", shard_optimizer=shard_optimizer
        )
        opt0 = tx.init(params)
        opt0 = (
            pmesh.shard_opt_state(opt0, m)
            if shard_optimizer
            else jax.tree.map(
                lambda x: jax.device_put(
                    x,
                    jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec()),
                ),
                opt0,
            )
        )
        state = TrainState(
            pmesh.replicate_params(params, m), opt0, jnp.zeros((), jnp.int32)
        )
        losses = []
        for _ in range(2):
            state, loss = dstep(state, b, t, mk, 1.0)
            losses.append(float(loss))
        return state, losses

    repl_state, repl_losses = run(False)
    z1_state, z1_losses = run(True)
    np.testing.assert_allclose(z1_losses, repl_losses, rtol=1e-6)
    for pr, pz in zip(
        jax.tree.leaves(repl_state.params), jax.tree.leaves(z1_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pz), np.asarray(pr), rtol=2e-5, atol=1e-6
        )
    # the big state leaves must actually BE sharded (not replicated)
    sharded_leaves = [
        x
        for x, s in zip(
            jax.tree.leaves(z1_state.opt_state),
            jax.tree.leaves(
                pmesh.opt_state_specs(z1_state.opt_state, m),
                is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec),
            ),
        )
        if s != jax.sharding.PartitionSpec()
    ]
    assert sharded_leaves, "no leaf received a ZeRO-1 shard"
    for x in sharded_leaves[:4]:
        assert not x.sharding.is_fully_replicated, x.sharding
