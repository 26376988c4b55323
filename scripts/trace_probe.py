#!/usr/bin/env python
"""On-chip profiler trace of the full-model forward (VERDICT r4 #2).

Captures a jax.profiler trace around the fused2 d=4 forward and converts
the xplane protobuf with tensorboard_plugin_profile into op-level stats,
printing where every millisecond goes (kernel self-times, XLA glue, DMA/
infeed gaps). This replaces the arithmetic overhead estimates of rounds
3-4 with measured attribution.

    python scripts/trace_probe.py [--d 4] [--iters 3] [--logdir /tmp/vfx_trace]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def summarize_xplane(logdir: str, top: int = 40):
    """Parse the newest xplane.pb via the tensorboard profile plugin and
    return (tool_outputs, op_rows). Falls back to raw xplane walking if
    the convert tools reject the file."""
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return None, []
    xplane = paths[-1]
    print(f"xplane: {xplane} ({os.path.getsize(xplane)/1e6:.1f} MB)")
    rows = []
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        obj = json.loads(data)
        # hlo_stats: list-of-dict rows or gviz table; normalize
        if isinstance(obj, dict) and "rows" in obj:
            cols = [c["label"] for c in obj.get("cols", [])]
            for r in obj["rows"]:
                rows.append(dict(zip(cols, [c.get("v") for c in r["c"]])))
        elif isinstance(obj, list):
            rows = obj
    except Exception as exc:
        print(f"hlo_stats convert failed ({exc!r}); raw xplane walk")
        try:
            from xprof.protobuf import xplane_pb2  # type: ignore
        except Exception:
            try:
                from tensorboard_plugin_profile.protobuf import xplane_pb2
            except Exception as exc2:
                print(f"no xplane proto available: {exc2!r}")
                return None, []
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(xplane, "rb").read())
        for plane in xs.planes:
            tot = {}
            for line in plane.lines:
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    tot[name] = tot.get(name, 0) + ev.duration_ps / 1e9
            rows.append({"plane": plane.name, "events_ms": {
                k: round(v, 3) for k, v in sorted(
                    tot.items(), key=lambda kv: -kv[1])[:top]
            }})
    return xplane, rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--d", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/vfx_trace")
    args = ap.parse_args()

    from variantformer_tpu.utils.jax_setup import enable_cache

    enable_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from variantformer_tpu.config import ModelConfig
    from variantformer_tpu.models.init import init_seq2gene
    from variantformer_tpu.models.seq2gene import seq2gene_forward
    from variantformer_tpu.ops.fused_modulator import pack_gene_layers

    cfg = ModelConfig()
    params = jax.jit(lambda k: init_seq2gene(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0)
    )
    params = dict(params)
    params["gene_layers_packed"] = pack_gene_layers(
        params["gene_layers"], cfg.seq2gene.num_heads,
        cfg.seq2gene.emb_dim // cfg.seq2gene.num_heads,
    )
    batch = _example_batch(
        d=args.d, c=384, g=cfg.dataset.max_chunks,
        length=cfg.dataset.max_length, t=54,
        vocab=cfg.window_encoder.vocab_size,
    )
    fwd = jax.jit(
        lambda p, b: seq2gene_forward(p, b, cfg, impl="fused2").pred_expression
    )
    np.asarray(fwd(params, batch))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fwd(params, batch))
    base_ms = 1e3 * (time.perf_counter() - t0)
    print(f"untraced forward: {base_ms:.1f} ms")

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            np.asarray(fwd(params, batch))
    print("trace captured")

    xplane, rows = summarize_xplane(args.logdir)
    if not rows:
        print(json.dumps({
            "metric": "trace_probe",
            "status": "no device events captured (relay-fronted runtime?)",
            "untraced_ms": round(base_ms, 1),
        }))
        return
    # print the top rows in a compact, greppable form
    out_rows = rows[:60]
    for r in out_rows:
        print(json.dumps(r)[:400])
    print(json.dumps({
        "metric": "trace_probe", "untraced_ms": round(base_ms, 1),
        "xplane": str(xplane), "n_rows": len(rows),
    }))


if __name__ == "__main__":
    main()
