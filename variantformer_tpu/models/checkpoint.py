"""Native checkpoint format: orbax pytree + JSON config sidecar.

Replaces torch.load/Lightning .pth as the framework's storage format
(N7 in SURVEY.md §2.2). ``convert_torch_checkpoint`` is the one-shot
migration path from the reference's released .pth files.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax

from variantformer_tpu.config import ModelConfig, _update


def _cfg_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_checkpoint(path: str | Path, params, cfg: ModelConfig | None = None):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / "params", params, force=True)
    if cfg is not None:
        (path / "config.json").write_text(json.dumps(_cfg_to_dict(cfg), indent=2))


def load_checkpoint(path: str | Path, dtype=None, mesh=None):
    """Restore (params, cfg). With ``mesh``, every leaf is restored DIRECTLY
    onto its multi-chip sharding (parallel/mesh.py param_specs) — orbax reads
    each device's shard from disk without materializing the full tree on one
    host/device, which is what a >HBM-sized model needs."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    restore_args = None
    if mesh is not None:
        from jax.sharding import NamedSharding

        from variantformer_tpu.parallel.mesh import param_specs

        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(path / "params").item_metadata.tree
        shape_tree = jax.tree.map(lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta)
        specs = param_specs(shape_tree)
        restore_args = jax.tree.map(
            lambda m, s: ocp.ArrayRestoreArgs(
                sharding=NamedSharding(mesh, s),
                dtype=(dtype or m.dtype),
            ),
            meta, specs,
        )
    with ocp.PyTreeCheckpointer() as ckptr:
        if restore_args is not None:
            params = ckptr.restore(
                path / "params",
                args=ocp.args.PyTreeRestore(restore_args=restore_args),
            )
        else:
            params = ckptr.restore(path / "params")
    cfg = None
    cfg_file = path / "config.json"
    if cfg_file.exists():
        cfg = _update(ModelConfig(), json.loads(cfg_file.read_text()))
    if dtype is not None and mesh is None:
        params = jax.tree.map(lambda x: jax.numpy.asarray(x, dtype), params)
    return params, cfg


def convert_torch_checkpoint(
    torch_path: str,
    out_dir: str,
    cfg: ModelConfig | None = None,
    num_heads: int = 32,
    encoder_num_heads: int = 8,
):
    """One-shot .pth -> orbax conversion of a seq2gene checkpoint."""
    from variantformer_tpu.models import convert

    sd, hyper = convert.load_torch_checkpoint(torch_path)
    params = convert.convert_seq2gene(
        sd, num_heads=num_heads, encoder_num_heads=encoder_num_heads
    )
    save_checkpoint(out_dir, params, cfg)
    return params, hyper


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--num-heads", type=int, default=32)
    ap.add_argument("--encoder-num-heads", type=int, default=8)
    args = ap.parse_args()
    convert_torch_checkpoint(
        args.torch_checkpoint, args.out_dir,
        num_heads=args.num_heads, encoder_num_heads=args.encoder_num_heads,
    )
