"""Training tests: loss numerics vs torch, frozen-tokenizer contract,
end-to-end train step reduces loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from variantformer_tpu.train import losses as L
from variantformer_tpu.train.optimizer import (
    decay_mask,
    make_optimizer,
    trainable_mask,
)


def test_poisson_nll_matches_torch():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.01, 5.0, 64).astype(np.float32)
    target = rng.integers(0, 8, 64).astype(np.float32)
    ref = torch.nn.PoissonNLLLoss(log_input=False, full=True, reduction="none")(
        torch.tensor(pred), torch.tensor(target)
    ).numpy()
    ours = np.asarray(L.poisson_nll(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_focal_loss_matches_reference_spec():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((16, 11)).astype(np.float32)
    labels = rng.integers(0, 11, 16)
    lt = torch.tensor(logits)
    yt = torch.tensor(labels)
    logpt = torch.log_softmax(lt, dim=1).gather(1, yt.view(-1, 1)).view(-1)
    pt = logpt.exp()
    ref = (-1 * (1 - pt) ** 2.0 * logpt).numpy()
    ours = np.asarray(L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), 2.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_weighted_ce_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((10, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 10)
    w = np.asarray([1.0, 2.0, 0.5, 3.0, 1.5], np.float32)
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w), reduction="none")(
        torch.tensor(logits), torch.tensor(labels)
    ).numpy()
    ours = np.asarray(
        L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), w)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_masks():
    from tests.test_model_smoke import tiny_config
    from variantformer_tpu.models.init import init_seq2gene

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    dm = decay_mask(params)
    assert dm["gene_layers"]["ffn_in"]["w"] is True
    assert dm["gene_layers"]["ffn_in"]["b"] is False
    assert dm["gene_layers"]["norm1"]["scale"] is False
    assert dm["registry"] is False
    assert dm["tissue_heads"]["w1"] is True
    assert dm["tissue_heads"]["ln_scale"] is False
    tm = trainable_mask(params, train_gene_tokenizer=False)
    assert tm["cre_tokenizer"]["token_embedding"] is False
    assert tm["gene_tokenizer"]["token_embedding"] is False
    assert tm["gene_map"]["w"] is True
    tm2 = trainable_mask(params, train_gene_tokenizer=True)
    assert tm2["gene_tokenizer"]["token_embedding"] is True


@pytest.mark.mid
def test_train_step_reduces_loss_and_freezes_tokenizer():
    from tests.test_model_smoke import tiny_batch, tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    tx = make_optimizer(
        params, learning_rate=3e-3, weight_decay=0.01, optimizer="adamw",
        train_gene_tokenizer=False, plateau="step",  # streaming plateau mode
    )
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_seq2gene_train_step(cfg, tx)
    batch = tiny_batch(np.random.default_rng(0))
    targets = jnp.asarray(np.random.default_rng(1).uniform(0, 3, (2, 3)), jnp.float32)
    mask = jnp.ones((2, 3), bool)

    cre_tok_before = np.asarray(params["cre_tokenizer"]["token_embedding"])
    gene_tok_before = np.asarray(params["gene_tokenizer"]["token_embedding"])
    losses = []
    loss = jnp.asarray(1.0)  # initial plateau-monitor value
    for _ in range(8):
        state, loss = step(state, batch, targets, mask, loss)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    np.testing.assert_array_equal(
        np.asarray(state.params["cre_tokenizer"]["token_embedding"]), cre_tok_before
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["gene_tokenizer"]["token_embedding"]), gene_tok_before
    )
    # trainable params moved
    assert not np.allclose(
        np.asarray(state.params["gene_map"]["w"]), np.asarray(params["gene_map"]["w"])
    )


def test_plateau_tracker_matches_torch():
    """PlateauTracker reproduces torch ReduceLROnPlateau epoch-cadence
    semantics (the reference's scheduler, seq2reg/model.py:503-510)."""
    from variantformer_tpu.train.loop import PlateauTracker

    values = [1.0, 0.9, 0.9, 0.9, 0.9, 0.89, 0.6, 0.61, 0.6, 0.6, 0.6, 0.59]
    # second sequence exercises cooldown semantics: improvements DURING the
    # cooldown window must not freeze the countdown
    values_cd = [1.0, 0.9, 0.9, 0.9, 0.9, 0.85, 0.84, 0.9, 0.9, 0.9, 0.9, 0.9]
    for vals, cooldown in ((values, 0), (values_cd, 2)):
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", patience=2, factor=0.5, threshold=1e-4,
            min_lr=1e-3, cooldown=cooldown,
        )
        ours = PlateauTracker(
            patience=2, factor=0.5, threshold=1e-4, min_scale=1e-3,
            cooldown=cooldown,
        )
        for v in vals:
            sched.step(v)
            scale = ours.update(v)
            assert scale == pytest.approx(opt.param_groups[0]["lr"]), (
                f"diverged at value {v} (cooldown={cooldown})"
            )
        assert ours.scale < 1.0  # each sequence plateaus


def _write_seq2reg_shards(root, n_train=4, n_val=2, chunk=8, length=16, seed=0):
    """Synthetic shards in Seq2RegShardWriter's npz schema: class-0 windows
    get low token ids, class-1 high — learnable from the embeddings."""
    rng = np.random.default_rng(seed)
    for split, count in (("train", n_train), ("test", n_val)):
        out = root / split
        out.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            labels = rng.integers(0, 2, chunk).astype(np.int32)
            tokens = np.where(
                labels[:, None] == 0,
                rng.integers(4, 16, (chunk, length)),
                rng.integers(16, 28, (chunk, length)),
            ).astype(np.int32)
            np.savez(
                out / f"S1_liver_chr1_chunk_{i}.npz",
                subject=np.array("S1"),
                tissue=np.array("liver"),
                tokens=tokens,
                tok_len=np.full(chunk, length, np.int32),
                ref_class=np.zeros(chunk, np.int32),
                tissue_class=labels,
                majority_class=labels,
                start=np.arange(chunk, dtype=np.int64),
                end=np.arange(chunk, dtype=np.int64) + 100,
            )


@pytest.mark.mid
def test_fit_seq2reg_end_to_end(tmp_path):
    """The fit loop trains a tiny window classifier from npz shards: loss
    drops, checkpoints land, and resume continues exactly where it left off
    (Lightning-Trainer semantics, SURVEY §3.5)."""
    from variantformer_tpu.config import ModelConfig, WindowEncoderConfig
    from variantformer_tpu.models.init import init_window_encoder
    from variantformer_tpu.train.loop import (
        fit,
        make_seq2reg_eval_loss,
        seq2reg_shard_batches,
    )
    from variantformer_tpu.train.steps import TrainState, make_seq2reg_train_step

    wcfg = WindowEncoderConfig(
        vocab_size=32, embedding_dim=32, num_heads=4, num_layers=1,
        ffn_hidden_dim=64, token_length=16, num_tissues=2, num_classes=2,
    )
    cfg = ModelConfig(window_encoder=wcfg)
    _write_seq2reg_shards(tmp_path / "shards")

    params = init_window_encoder(jax.random.key(0), wcfg)
    tx = make_optimizer(params, learning_rate=3e-3, plateau="epoch")
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_seq2reg_train_step(cfg, tx)
    vocab = {"liver": 1}
    train_b = seq2reg_shard_batches(tmp_path / "shards", vocab)
    val_b = seq2reg_shard_batches(
        tmp_path / "shards", vocab, split="test", shuffle=False
    )
    eval_loss = make_seq2reg_eval_loss(cfg, val_b)

    res = fit(
        state, step, train_b, eval_loss=eval_loss, epochs=3,
        ckpt_dir=tmp_path / "ckpt",
    )
    assert len(res.history) == 3
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]
    assert (tmp_path / "ckpt" / "last").exists()
    assert (tmp_path / "ckpt" / "best").exists()
    assert res.best_val == min(h["val_loss"] for h in res.history)

    # Resume: a fresh state + fit(resume=True) picks up at epoch 3 and the
    # restored params match what was saved (first new epoch continues the
    # trained trajectory, not a re-init).
    state2 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    res2 = fit(
        state2, step, train_b, eval_loss=eval_loss, epochs=5,
        ckpt_dir=tmp_path / "ckpt", resume=True,
    )
    assert [h["epoch"] for h in res2.history] == [0, 1, 2, 3, 4]
    assert res2.history[:3] == res.history
    assert res2.history[3]["train_loss"] < res.history[0]["train_loss"]
    assert int(res2.state.step) == 5 * 4  # 4 train shards per epoch


@pytest.mark.mid
def test_fit_seq2gene_from_shards(tmp_path):
    """seq2gene expression training from TrainingShardWriter-format npz
    shards: sparse per-shard (tissue, expression) labels become dense
    masked targets, short batches pad with zeroed masks, loss drops."""
    from tests.test_model_smoke import tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.loop import (
        fit,
        make_seq2gene_eval_loss,
        seq2gene_shard_batches,
    )
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    rng = np.random.default_rng(0)
    for i in range(5):
        c, g, l = 4 + i % 2, 3, 8
        np.savez(
            tmp_path / f"GENE{i}.1__D1.npz",
            cre_tokens=rng.integers(4, 32, (c, l)).astype(np.int32),
            cre_tok_len=np.full(c, l, np.int32),
            cre_labels=rng.integers(0, 9, c).astype(np.int32),
            gene_tokens=rng.integers(4, 32, (g, l)).astype(np.int32),
            gene_tok_len=np.full(g, l, np.int32),
            strand=np.int32(i % 2),
            tissue_ids=np.asarray([0, 2], np.int32),
            targets=np.asarray([1.0 + i, 0.5], np.float32),
        )

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    tx = make_optimizer(params, learning_rate=3e-3, plateau="epoch")
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_seq2gene_train_step(cfg, tx)
    tissues = [0, 1, 2]
    train_b = seq2gene_shard_batches(tmp_path, tissues, batch_size=2)

    # tissue 1 has no labels anywhere -> fully masked column
    batch0, tgt0, msk0 = next(iter(train_b(0)))
    assert tgt0.shape == (2, 3) and not bool(msk0[:, 1].any())
    assert batch0.cre_tokens.shape[0] == 2

    res = fit(
        state, step, train_b,
        eval_loss=make_seq2gene_eval_loss(
            cfg, seq2gene_shard_batches(tmp_path, tissues, batch_size=2,
                                        shuffle=False)
        ),
        epochs=4,
    )
    assert res.history[-1]["val_loss"] < res.history[0]["val_loss"]


@pytest.mark.slow
def test_fit_on_mesh_matches_unmeshed(tmp_path):
    """fit(mesh=...) — DP+TP training in one flag — reproduces the
    single-device loss trajectory (needs the 8-device CPU mesh; batch size
    must be a multiple of the data axis)."""
    from tests.test_model_smoke import tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.parallel import mesh as pmesh
    from variantformer_tpu.train.loop import fit, seq2gene_shard_batches
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")

    rng = np.random.default_rng(0)
    for i in range(4):
        c, g, l = 4, 3, 8
        np.savez(
            tmp_path / f"GENE{i}.1__D1.npz",
            cre_tokens=rng.integers(4, 32, (c, l)).astype(np.int32),
            cre_tok_len=np.full(c, l, np.int32),
            cre_labels=rng.integers(0, 9, c).astype(np.int32),
            gene_tokens=rng.integers(4, 32, (g, l)).astype(np.int32),
            gene_tok_len=np.full(g, l, np.int32),
            strand=np.int32(0),
            tissue_ids=np.asarray([0, 2], np.int32),
            targets=np.asarray([1.0 + i, 0.5], np.float32),
        )

    import dataclasses

    cfg = tiny_config()
    # 4 heads on a 4-way model axis; f32 so trajectories compare tightly
    from variantformer_tpu.config import PrecisionPolicy

    cfg = dataclasses.replace(cfg, precision=PrecisionPolicy(compute_dtype="float32"))
    params = init_seq2gene(jax.random.key(0), cfg)
    tx = make_optimizer(params, learning_rate=1e-3, plateau="epoch")
    step = make_seq2gene_train_step(cfg, tx)
    batches = lambda: seq2gene_shard_batches(tmp_path, [0, 1, 2], batch_size=2)

    def run(mesh):
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        return fit(state, step, batches(), epochs=2, mesh=mesh)

    base = run(None)
    meshed = run(pmesh.make_mesh(devices=jax.devices()[:8]))
    for a, b in zip(base.history, meshed.history):
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=2e-5)


def test_fit_seq2reg_on_mesh_matches_unmeshed(tmp_path):
    """Seq2Reg (window-classifier) training also runs DP+TP via
    fit(mesh=...): per-row batches shard over "data", the encoder's packed
    projections over "model"."""
    from variantformer_tpu.config import ModelConfig, WindowEncoderConfig
    from variantformer_tpu.models.init import init_window_encoder
    from variantformer_tpu.parallel import mesh as pmesh
    from variantformer_tpu.train.loop import fit, seq2reg_shard_batches
    from variantformer_tpu.train.steps import TrainState, make_seq2reg_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")

    wcfg = WindowEncoderConfig(
        vocab_size=32, embedding_dim=32, num_heads=4, num_layers=1,
        ffn_hidden_dim=64, token_length=16, num_tissues=2, num_classes=2,
    )
    cfg = ModelConfig(window_encoder=wcfg)
    _write_seq2reg_shards(tmp_path / "shards", n_train=4, n_val=0)
    params = init_window_encoder(jax.random.key(0), wcfg)
    tx = make_optimizer(params, learning_rate=1e-3)
    step = make_seq2reg_train_step(cfg, tx)
    batches = seq2reg_shard_batches(tmp_path / "shards", {"liver": 1})

    def run(mesh):
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        return fit(state, step, batches, epochs=2, mesh=mesh)

    base = run(None)
    meshed = run(pmesh.make_mesh(devices=jax.devices()[:8]))
    for a, b in zip(base.history, meshed.history):
        assert b["train_loss"] == pytest.approx(a["train_loss"], rel=2e-5)


def test_fit_early_stop(tmp_path):
    """Early stopping halts after patience epochs without val improvement."""
    from variantformer_tpu.train.loop import fit
    from variantformer_tpu.train.steps import TrainState

    state = TrainState({}, (), jnp.zeros((), jnp.int32))
    vals = iter([1.0, 0.5, 0.6, 0.7, 0.8, 0.9, 0.9])
    res = fit(
        state,
        lambda s, x, scale: (s, jnp.asarray(0.0)),
        lambda epoch: [(np.zeros(1),)],
        eval_loss=lambda s: next(vals),
        epochs=7,
        early_stop_patience=3,
    )
    assert len(res.history) == 5  # stops at epoch 4 (best was epoch 1)
    assert res.best_epoch == 1


@pytest.mark.slow
def test_remat_matches_and_trains():
    """jax.checkpoint-wrapped layer scans: identical forward, working grads."""
    import dataclasses

    from tests.test_model_smoke import tiny_batch, tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward
    from variantformer_tpu.train.steps import seq2gene_loss_fn

    # only_cross_attention=False (the shipped wiring): with cross-only gene
    # layers, gene windows cannot reach the registry token and gene_map grads
    # are legitimately zero.
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, seq2gene=dataclasses.replace(cfg.seq2gene, only_cross_attention=False)
    )
    cfg_remat = dataclasses.replace(
        cfg, seq2gene=dataclasses.replace(cfg.seq2gene, remat=True)
    )
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    out_a = seq2gene_forward(params, batch, cfg)
    out_b = seq2gene_forward(params, batch, cfg_remat)
    np.testing.assert_allclose(
        np.asarray(out_a.pred_expression), np.asarray(out_b.pred_expression),
        rtol=1e-5,
    )
    targets = jnp.asarray(np.random.default_rng(1).uniform(0, 3, (2, 3)), jnp.float32)
    mask = jnp.ones((2, 3), bool)
    g = jax.grad(seq2gene_loss_fn)(params, batch, targets, mask, cfg_remat)
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g["gene_map"])))
    assert np.isfinite(gn) and gn > 0


def test_process_split_equal_batches(tmp_path):
    """Multi-host shard split must give every host the SAME number of local
    batches — a host with one extra batch would enqueue a global collective
    the others never join (DCN deadlock). 5 shards over 2 hosts -> 2 each."""
    from variantformer_tpu.train.loop import seq2gene_shard_batches

    rng = np.random.default_rng(0)
    for i in range(5):
        np.savez(
            tmp_path / f"GENE{i}.1__D1.npz",
            cre_tokens=rng.integers(4, 32, (4, 8)).astype(np.int32),
            cre_tok_len=np.full(4, 8, np.int32),
            cre_labels=rng.integers(0, 9, 4).astype(np.int32),
            gene_tokens=rng.integers(4, 32, (3, 8)).astype(np.int32),
            gene_tok_len=np.full(3, 8, np.int32),
            strand=np.int32(0),
            tissue_ids=np.asarray([0], np.int32),
            targets=np.asarray([1.0], np.float32),
        )
    counts = []
    for pi in range(2):
        b = seq2gene_shard_batches(
            tmp_path, [0], batch_size=1, process_split=(pi, 2)
        )
        counts.append(sum(1 for _ in b(0)))
    assert counts == [2, 2]


def test_legacy_shard_tissue_recovery(tmp_path):
    """Shards without a 'tissue' npz key recover it from the
    {subject}_{tissue}_{chrom}_chunk_{n} filename when exactly one vocab
    key matches; ambiguity or no match raises instead of silently training
    against the wrong tissue embedding."""
    from variantformer_tpu.train.loop import seq2reg_shard_batches

    def write(name):
        rng = np.random.default_rng(0)
        np.savez(
            name,
            tokens=rng.integers(4, 16, (4, 8)).astype(np.int32),
            tok_len=np.full(4, 8, np.int32),
            ref_class=np.zeros(4, np.int32),
            tissue_class=np.zeros(4, np.int32),
        )

    out = tmp_path / "train"
    out.mkdir(parents=True)
    write(out / "HG_00096_adipose_subcutaneous_chr1_chunk_0.npz")
    vocab = {"adipose_subcutaneous": 3, "liver": 1}
    batches = seq2reg_shard_batches(tmp_path, vocab)
    (_, _, _, tissue_ids, _), = list(batches(0))
    assert int(tissue_ids[0]) == 3  # underscores in subject AND tissue

    # Ambiguous: both 'lung' and 'upper_lung' suffix-match -> loud error.
    write(out / "HG_upper_lung_chr1_chunk_0.npz")
    batches = seq2reg_shard_batches(
        tmp_path,
        {"adipose_subcutaneous": 3, "lung": 2, "upper_lung": 5},
        shuffle=False,
    )
    with pytest.raises(ValueError, match="unambiguously"):
        list(batches(0))
    (out / "HG_upper_lung_chr1_chunk_0.npz").unlink()

    # Unrecoverable name -> clear error, not KeyError/wrong tissue.
    write(out / "S1_unknowntissue_chr1_chunk_0.npz")
    batches = seq2reg_shard_batches(tmp_path, vocab, shuffle=False)
    with pytest.raises(ValueError, match="cannot recover"):
        list(batches(0))


def test_pick_tissue_block_respects_vmem_cap():
    """TB=9 measured OOM at full geometry — never a candidate; counts that
    only 9 divides fall back to 6 (the wrapper pads the tissue axis)."""
    from variantformer_tpu.ops.fused_modulator import pick_tissue_block

    assert pick_tissue_block(54) == 6
    assert pick_tissue_block(54, d=4) == 4  # donor-folded grid: TB=6 OOMs
    assert pick_tissue_block(54, d=2) == 4
    assert pick_tissue_block(3, d=4) == 3
    assert pick_tissue_block(45) == 6   # 45 % 9 == 0, but 9 is banned
    assert pick_tissue_block(8) == 8
    assert pick_tissue_block(7) == 7
    assert pick_tissue_block(4) == 4
    assert all(pick_tissue_block(t) <= 8 for t in range(1, 200))


def test_step_plateau_mode_feeds_loss():
    """make_*_train_step(plateau='step') must feed the step's own loss to
    reduce_on_plateau when plateau_value is omitted — a constant 1.0 would
    count every step as non-improving and silently decay the LR to the
    floor."""
    from variantformer_tpu.config import ModelConfig, WindowEncoderConfig
    from variantformer_tpu.models.init import init_window_encoder
    from variantformer_tpu.train.steps import TrainState, make_seq2reg_train_step

    wcfg = WindowEncoderConfig(
        vocab_size=32, embedding_dim=32, num_heads=4, num_layers=1,
        ffn_hidden_dim=64, token_length=16, num_tissues=2, num_classes=2,
    )
    cfg = ModelConfig(window_encoder=wcfg)
    params = init_window_encoder(jax.random.key(0), wcfg)
    tx = make_optimizer(
        params, learning_rate=3e-3, plateau="step", plateau_patience=1
    )
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_seq2reg_train_step(cfg, tx, plateau="step")

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 8).astype(np.int32)
    tokens = np.where(
        labels[:, None] == 0,
        rng.integers(4, 16, (8, 16)),
        rng.integers(16, 28, (8, 16)),
    ).astype(np.int32)
    args = (
        jnp.asarray(tokens), jnp.full((8,), 16, jnp.int32),
        jnp.zeros((8,), jnp.int32), jnp.ones((8,), jnp.int32),
        jnp.asarray(labels),
    )
    losses = []
    for _ in range(6):
        state, loss = step(state, *args)
        losses.append(float(loss))
    # Training loss falls -> plateau sees improvement -> the
    # reduce_on_plateau scale must NOT have collapsed to min_scale.
    assert losses[-1] < losses[0]

    def find_scale(s):
        if hasattr(s, "scale") and hasattr(s, "plateau_count"):
            return float(s.scale)
        if isinstance(s, tuple):
            for item in s:
                r = find_scale(item)
                if r is not None:
                    return r
        return None

    scale = find_scale(state.opt_state)
    assert scale is not None and scale > 0.9


def test_classification_metrics_reference_semantics():
    """Per-class F1 + acc with the reference's naming scheme
    (seq2reg/model.py:355-436): classes with no true samples are skipped,
    per-tissue blocks prefix the tissue name, commas are stripped."""
    from variantformer_tpu.train.metrics import (
        classification_metrics,
        per_class_f1,
    )

    labels = np.array([0, 0, 1, 1, 1, 2])
    preds = np.array([0, 1, 1, 1, 0, 2])
    f1 = per_class_f1(preds, labels, num_classes=4)
    assert set(f1) == {0, 1, 2}  # class 3 absent -> skipped
    # class 0: tp=1 fp=1 fn=1 -> P=R=0.5 -> F1=0.5
    assert abs(f1[0] - 0.5) < 1e-9
    # class 2: perfect
    assert f1[2] == 1.0

    m = classification_metrics(
        preds, labels, class_names=["PLS", "pELS,dELS", "CTCF", "DNase"],
        tissue_ids=np.array([0, 0, 0, 1, 1, 1]),
        tissue_names={0: "liver", 1: "lung"},
    )
    assert abs(m["val_acc"] - 4 / 6) < 1e-9
    assert "val_f1_class_pELSdELS" in m  # comma stripped
    assert "liver_val_acc" in m and "lung_val_acc" in m
    # liver block has no class-2 samples -> no liver CTCF F1
    assert "liver_val_f1_class_CTCF" not in m
    assert "lung_val_f1_class_CTCF" in m


def test_seq2reg_eval_metrics_end_to_end(tmp_path):
    """make_seq2reg_eval_metrics runs the classifier over shard batches and
    returns the flat metric dict."""
    from variantformer_tpu.config import ModelConfig, WindowEncoderConfig
    from variantformer_tpu.models.init import init_window_encoder
    from variantformer_tpu.train.loop import seq2reg_shard_batches
    from variantformer_tpu.train.metrics import make_seq2reg_eval_metrics
    from variantformer_tpu.train.steps import TrainState

    wcfg = WindowEncoderConfig(
        vocab_size=32, embedding_dim=32, num_heads=4, num_layers=1,
        ffn_hidden_dim=64, token_length=16, num_tissues=2, num_classes=2,
    )
    cfg = ModelConfig(window_encoder=wcfg)
    _write_seq2reg_shards(tmp_path / "shards")
    params = init_window_encoder(jax.random.key(0), wcfg)
    state = TrainState(params, None, jnp.zeros((), jnp.int32))

    metrics_fn = make_seq2reg_eval_metrics(
        cfg,
        seq2reg_shard_batches(
            tmp_path / "shards", {"liver": 1}, split="test", shuffle=False
        ),
        class_names=["class0", "class1"],
        tissue_names={1: "liver"},
    )
    m = metrics_fn(state)
    assert 0.0 <= m["val_acc"] <= 1.0
    assert "liver_val_acc" in m


def test_gradient_accumulation():
    """accumulate_steps=k: params move only every k micro-steps, and the
    update equals one step on the k-averaged gradients; the plateau
    ``value`` extra arg still threads through MultiSteps."""
    from variantformer_tpu.config import ModelConfig, WindowEncoderConfig
    from variantformer_tpu.models.init import init_window_encoder
    from variantformer_tpu.train.steps import TrainState, make_seq2reg_train_step

    wcfg = WindowEncoderConfig(
        vocab_size=32, embedding_dim=32, num_heads=4, num_layers=1,
        ffn_hidden_dim=64, token_length=16, num_tissues=2, num_classes=2,
    )
    cfg = ModelConfig(window_encoder=wcfg)
    params = init_window_encoder(jax.random.key(0), wcfg)
    tx = make_optimizer(params, learning_rate=3e-3, accumulate_steps=2)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_seq2reg_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 8).astype(np.int32)
    tokens = np.where(
        labels[:, None] == 0,
        rng.integers(4, 16, (8, 16)),
        rng.integers(16, 28, (8, 16)),
    ).astype(np.int32)
    args = (
        jnp.asarray(tokens), jnp.full((8,), 16, jnp.int32),
        jnp.zeros((8,), jnp.int32), jnp.ones((8,), jnp.int32),
        jnp.asarray(labels),
    )
    def changed(a, b) -> bool:
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    state1, _ = step(state, *args)
    # first micro-step: accumulating, no real update anywhere in the tree
    assert not changed(state1.params, params)
    state2, _ = step(state1, *args)
    # second micro-step: the real update fires
    assert changed(state2.params, params)

    # identical micro-batches -> averaged grad == single grad, so the
    # accumulated update must equal one unaccumulated step
    tx_plain = make_optimizer(params, learning_rate=3e-3)
    sp = TrainState(params, tx_plain.init(params), jnp.zeros((), jnp.int32))
    step_plain = make_seq2reg_train_step(cfg, tx_plain)
    sp1, _ = step_plain(sp, *args)
    for a, b in zip(jax.tree.leaves(sp1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.mid
def test_freeze_tokenizers_step_matches_and_runs_fused():
    """freeze_tokenizers=True must (a) reproduce the default step's
    trajectory exactly when paired with train_gene_tokenizer=False — the
    stopped gradients are the ones the optimizer zeroed anyway — and (b)
    admit the VJP-less fused encoder kernel in the training forward."""
    from tests.test_model_smoke import tiny_batch, tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    targets = jnp.asarray(
        np.random.default_rng(1).uniform(0, 3, (2, 3)), jnp.float32
    )
    mask = jnp.ones((2, 3), bool)

    def run(**step_kwargs):
        tx = make_optimizer(
            params, learning_rate=3e-3, train_gene_tokenizer=False
        )
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = make_seq2gene_train_step(cfg, tx, **step_kwargs)
        losses = []
        for _ in range(3):
            state, loss = step(state, batch, targets, mask)
            losses.append(float(loss))
        return state, losses

    base_state, base_losses = run()
    frozen_state, frozen_losses = run(freeze_tokenizers=True)
    np.testing.assert_allclose(frozen_losses, base_losses, rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(base_state.params), jax.tree.leaves(frozen_state.params)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6,
                                   atol=1e-7)

    # fused encoder in the training forward (interpreter on CPU): loss
    # drops and tokenizers stay put.
    fused_state, fused_losses = run(impl="fused", freeze_tokenizers=True)
    assert fused_losses[-1] < fused_losses[0]
    np.testing.assert_array_equal(
        np.asarray(fused_state.params["cre_tokenizer"]["token_embedding"]),
        np.asarray(params["cre_tokenizer"]["token_embedding"]),
    )

    with pytest.raises(ValueError, match="training impl"):
        make_seq2gene_train_step(cfg, None, impl="pallas3")


@pytest.mark.slow
def test_fused_encoder_backward_trains_tokenizers():
    """impl='fused' with TRAINABLE tokenizers: the fused encoder's custom
    VJP (recompute Pallas backward) must carry real gradients into both
    tokenizer stacks and track the XLA step's loss trajectory."""
    from tests.test_model_smoke import tiny_batch, tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    targets = jnp.asarray(
        np.random.default_rng(1).uniform(0, 3, (2, 3)), jnp.float32
    )
    mask = jnp.ones((2, 3), bool)

    def run(impl):
        tx = make_optimizer(params, learning_rate=3e-3, train_gene_tokenizer=True)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = make_seq2gene_train_step(cfg, tx, impl=impl,
                                        train_gene_tokenizer=True)
        losses = []
        for _ in range(3):
            state, loss = step(state, batch, targets, mask)
            losses.append(float(loss))
        return state, losses

    xla_state, xla_losses = run("xla")
    fused_state, fused_losses = run("fused")
    # the gene tokenizer actually moved under the fused step: real gradients
    # crossed the fused encoder's VJP (the optimizer ALWAYS hard-freezes the
    # CRE tokenizer — the reference's training contract, optimizer.py:48)
    gene_before = np.asarray(params["gene_tokenizer"]["token_embedding"])
    gene_after = np.asarray(
        fused_state.params["gene_tokenizer"]["token_embedding"]
    )
    assert np.abs(gene_after - gene_before).max() > 0
    np.testing.assert_array_equal(
        np.asarray(fused_state.params["cre_tokenizer"]["token_embedding"]),
        np.asarray(params["cre_tokenizer"]["token_embedding"]),
    )
    # trajectory tracks the XLA step within kernel (bf16) tolerance
    np.testing.assert_allclose(fused_losses, xla_losses, rtol=5e-2)


@pytest.mark.mid
def test_freeze_tokenizers_respects_trainable_gene_tokenizer():
    """freeze_tokenizers=True with train_gene_tokenizer=True must keep the
    gene tokenizer TRAINING (only the CRE tokenizer's backward is skipped)
    — stopping its gradient while the optimizer still updates the subtree
    would silently corrupt it."""
    from tests.test_model_smoke import tiny_batch, tiny_config
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.train.steps import TrainState, make_seq2gene_train_step

    cfg = tiny_config()
    params = init_seq2gene(jax.random.key(0), cfg)
    batch = tiny_batch(np.random.default_rng(0))
    targets = jnp.asarray(
        np.random.default_rng(1).uniform(0, 3, (2, 3)), jnp.float32
    )
    mask = jnp.ones((2, 3), bool)
    tx = make_optimizer(params, learning_rate=3e-3, train_gene_tokenizer=True)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_seq2gene_train_step(
        cfg, tx, freeze_tokenizers=True, train_gene_tokenizer=True
    )
    for _ in range(2):
        state, _ = step(state, batch, targets, mask)
    assert not np.allclose(
        np.asarray(state.params["gene_tokenizer"]["token_embedding"]),
        np.asarray(params["gene_tokenizer"]["token_embedding"]),
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["cre_tokenizer"]["token_embedding"]),
        np.asarray(params["cre_tokenizer"]["token_embedding"]),
    )
