"""Empirical Mosaic capability probes for this rig's TPU.

Each probe compiles a minimal kernel exercising one capability and checks the
result numerically. Extends the round-1 capability matrix (NOTES.md):

    python scripts/mosaic_capability_probe.py 48slice 3dreshape ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe_48slice():
    """Lane slicing of a VMEM value at 48-element offsets."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for h in range(4):
            o_ref[:, h * 48 : (h + 1) * 48] = x[:, h * 48 : (h + 1) * 48] * (h + 1.0)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 192)), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((16, 192), jnp.float32)
    )(x)
    expect = np.asarray(x) * np.repeat([1.0, 2.0, 3.0, 4.0], 48)[None, :]
    err = float(np.abs(np.asarray(out) - expect).max())
    return err < 1e-6, f"max err {err}"


def probe_3dreshape():
    """[R, H*D] -> [R, H, D] lane-splitting reshape of a VMEM value."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        x = x_ref[...]                      # [16, 192]
        x3 = x.reshape(16, 4, 48)           # lane split
        o_ref[...] = jnp.sum(x3, axis=1)    # [16, 48]

    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 192)), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((16, 48), jnp.float32)
    )(x)
    expect = np.asarray(x).reshape(16, 4, 48).sum(1)
    err = float(np.abs(np.asarray(out) - expect).max())
    return err < 1e-5, f"max err {err}"


PROBES = {"48slice": probe_48slice, "3dreshape": probe_3dreshape}




def probe_48slice_bf16_matmul():
    """bf16 48-offset slices feeding dot_general (the modulator pattern)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for h in range(4):
            q = x[:, h * 48 : (h + 1) * 48]
            s = jax.lax.dot_general(
                q, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[:, h * 16 : (h + 1) * 16] = s[:, :16].astype(jnp.bfloat16)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 192)), jnp.bfloat16)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((32, 64), jnp.bfloat16)
    )(x)
    xf = np.asarray(x, np.float32)
    expect = np.stack(
        [(xf[:, h*48:(h+1)*48] @ xf[:, h*48:(h+1)*48].T)[:, :16] for h in range(4)],
        axis=-1,
    ).transpose(0, 2, 1).reshape(32, 64)
    err = float(np.abs(np.asarray(out, np.float32) - expect).max())
    return err < 0.5, f"max err {err}"


PROBES["48bf16mm"] = probe_48slice_bf16_matmul


def main():
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        try:
            ok, detail = PROBES[name]()
            print(f"{name}: {'OK' if ok else 'WRONG-RESULT'} ({detail})")
        except Exception as exc:
            print(f"{name}: FAIL ({type(exc).__name__}: {str(exc)[:200]})")


if __name__ == "__main__":
    main()
