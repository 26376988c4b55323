"""Serving export: serialize the forward as a portable StableHLO artifact.

Production deployment shouldn't need the model-building Python on the
serving host. ``jax.export`` lowers the jitted forward once (static shapes,
chosen target platforms) into a versioned StableHLO program that any
matching JAX runtime can deserialize and call — weights stay external
(orbax / converted ``.pth`` pytrees), so the artifact is megabytes of
program, not gigabytes of parameters.

The reference has no serving story (Lightning ``trainer.predict`` on a dev
box is the only path); this is the TPU-native equivalent of shipping a
compiled engine.

Contract: one artifact per device batch shape (D, C, G, L, T) — the same
static-shape buckets the processors dispatch. Typical deployments export
the canonical shape(s) a sweep uses.
"""

from __future__ import annotations

from pathlib import Path

import jax

from variantformer_tpu.config import ModelConfig
from variantformer_tpu.models.seq2gene import Seq2GeneBatch, Seq2GeneOutput

_REGISTERED = False


def _register() -> None:
    """Pytree-serialization for the batch/output namedtuples (required so
    the exported calling convention round-trips)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export

    for cls in (Seq2GeneBatch, Seq2GeneOutput):
        # A ValueError here means something else registered these classes
        # under a different serialized name — artifacts would then carry a
        # calling convention load_exported on other hosts can't match, so
        # let it propagate rather than silently exporting with alien names.
        export.register_namedtuple_serialization(
            cls, serialized_name=f"variantformer_tpu.{cls.__name__}"
        )
    _REGISTERED = True


def export_forward(
    cfg: ModelConfig,
    params,
    batch: Seq2GeneBatch,
    out_path: str | Path,
    impl: str = "xla",
    platforms: tuple[str, ...] | None = None,
) -> str:
    """Serialize ``seq2gene_forward`` for ``batch``'s exact shapes.

    ``params``/``batch`` may be concrete arrays or ShapeDtypeStructs — only
    shapes/dtypes matter. ``platforms`` defaults to the current backend
    (pass ``("tpu",)`` to cross-build a TPU artifact from a CPU host;
    ``impl="fused2"`` embeds the Mosaic kernels and is TPU-only)."""
    from jax import export

    from variantformer_tpu.models.seq2gene import seq2gene_forward

    _register()

    def fn(p, b):
        return seq2gene_forward(p, b, cfg, impl=impl)

    exported = export.export(
        jax.jit(fn),
        platforms=list(platforms) if platforms else None,
    )(params, batch)
    out_path = Path(out_path)
    out_path.write_bytes(exported.serialize())
    return str(out_path)


def load_exported(path: str | Path):
    """Deserialize a serving artifact into a callable ``fn(params, batch)
    -> Seq2GeneOutput`` (jit-compatible; shapes must match the export)."""
    from jax import export

    _register()
    exported = export.deserialize(Path(path).read_bytes())

    def fn(params, batch: Seq2GeneBatch) -> Seq2GeneOutput:
        return exported.call(params, batch)

    return fn
