"""Full-size fused-modulator timing probe (round-2 work item, NOTES.md).

Compiles and times ops/fused_modulator.fused_gene_modulator at the shipped
model geometry (E=1536, H=32, 25 layers, T=54, G1=201, C=384) against the
layered XLA gene stack. Expect the first Mosaic compile to take >25 min on
the axon remote compiler — the persistent compilation cache makes reruns
instant, so run this once with a generous timeout before benchmarking.

    python scripts/fused_modulator_probe.py [--skip-kernel|--skip-xla]
"""

import argparse
import os
import sys
import time

# Insert the repo root here, NOT via PYTHONPATH: a repo-first PYTHONPATH at
# interpreter startup breaks the axon TPU plugin's registration on this rig.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from variantformer_tpu.models.core import AttnSpec
from variantformer_tpu.models.init import _context_layer_stack
from variantformer_tpu.models.seq2gene import _gene_layer
from variantformer_tpu.ops.alibi import alibi_slopes
from variantformer_tpu.ops.fused_modulator import (
    fused_gene_modulator_packed,
    pack_gene_layers,
)
from variantformer_tpu.utils.jax_setup import enable_cache

E, H, D, F, L = 1536, 32, 48, 2048, 25
T, G1, C = 54, 201, 384


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:8])  # host transfer = sync


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-kernel", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--tb", type=int, default=6, help="tissue_block")
    args = ap.parse_args()
    enable_cache()

    layers = _context_layer_stack(jax.random.key(0), L, E, F)
    rng = np.random.default_rng(0)
    gene = jnp.asarray(rng.normal(size=(T, G1, E)) * 0.5, jnp.float32)
    cre = jnp.asarray(rng.normal(size=(L, C, E)) * 0.5, jnp.float32)
    slopes = jnp.asarray(alibi_slopes(H))
    out_k = out_x = None

    def timed(tag, fn):
        t0 = time.time()
        out = fn()
        _sync(out)
        print(f"{tag}: compiled+ran in {time.time() - t0:.1f}s", flush=True)
        times = []
        for _ in range(5):
            t0 = time.time()
            _sync(fn())
            times.append(time.time() - t0)
        print(
            f"{tag}: steady-state median {sorted(times)[2] * 1000:.1f} ms "
            f"({[f'{x * 1000:.0f}' for x in times]})",
            flush=True,
        )
        return np.asarray(out, np.float32)

    if not args.skip_kernel:
        # Pack once outside the timed call (as VCFProcessor.set_params does);
        # timing the per-call packing wrapper inflated round-1 numbers.
        packed = jax.block_until_ready(pack_gene_layers(layers, H, D))
        out_k = timed(
            "fused kernel",
            lambda: fused_gene_modulator_packed(
                gene, cre, jnp.int32(G1), jnp.int32(300), packed, slopes,
                F, D ** -0.5, H, D, tissue_block=args.tb,
            ),
        )

    if not args.skip_xla:
        spec = AttnSpec(H, D)

        @jax.jit
        def gene_stack(layers, gene, cre):
            x = gene[None].astype(jnp.bfloat16)

            def body(x, inp):
                lp, cre_i = inp
                out = _gene_layer(
                    lp, x, cre_i[None],
                    jnp.asarray([G1], jnp.int32), jnp.asarray([300], jnp.int32),
                    slopes, False, spec, jnp.bfloat16,
                )
                return out, None

            x, _ = jax.lax.scan(body, x, (layers, cre))
            return x[0]

        out_x = timed("xla gene stack", lambda: gene_stack(layers, gene, cre))

    if out_k is not None and out_x is not None:
        err = np.abs(out_k - out_x)
        den = np.abs(out_x) + 1e-2
        print(f"kernel vs xla: max abs {err.max():.4f}  mean rel {(err / den).mean():.5f}")


if __name__ == "__main__":
    main()
