"""Scaling-efficiency benchmark: frames/s at 1..N devices.

BASELINE.md target: ≥0.9 scaling efficiency from 1 chip → 1 host → N
hosts with batch-sharded frames.  On a pod slice this script measures
real ICI/DCN scaling; on a single-chip or CPU environment it runs the
same sharded program over an N-way virtual device mesh
(``--xla_force_host_platform_device_count``), which validates the
sharding/collective structure (the program XLA compiles is the same
SPMD program a pod runs) while the quoted efficiency is only meaningful
on real multi-chip hardware.

Run: python -m benchmarks.scaling_bench [--sizes 1 2 4 8]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def run(device_counts=None):
    import jax
    import jax.numpy as jnp

    import vacv_tpu as vc
    from vacv_tpu.parallel import make_mesh, put_sharded
    from vacv_tpu.utils.perf import device_time
    from vacv_tpu.ops.crop import crop_dynamic
    from vacv_tpu.ops.normalize import normalize_jnp
    from vacv_tpu.ops.resize import resize
    from vacv_tpu.core.types import Layout

    devices = jax.devices()
    if len(devices) == 1:
        cpus = jax.devices("cpu") if jax.default_backend() != "cpu" else devices
        if len(cpus) > len(devices):
            devices = cpus
            print(f"# single accelerator — using {len(devices)} virtual CPU "
                  "devices (sharding validation, not real scaling numbers)")
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8) if n <= len(devices)]

    H, W, OUT = 360, 640, 224
    per_dev_batch = 4

    def per_image(x, left):
        img = crop_dynamic(vc.Image(x, Layout.HWC), left, 8, 608, 336)
        img = resize(img, (OUT, OUT))
        img = img.change_layout(Layout.CHW).change_dtype(jnp.float32)
        return normalize_jnp(img).data

    results = []
    base = None
    rng = np.random.default_rng(0)
    for n in device_counts:
        mesh = make_mesh(devices[:n])
        batch = rng.integers(
            0, 256, size=(per_dev_batch * n, H, W, 3), dtype=np.uint8
        )
        dev_batch = put_sharded(batch, mesh)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def step(i, b):
            fn = lambda x: per_image(x, 8 + (i % 2))
            return shard_map(
                jax.vmap(fn), mesh=mesh, in_specs=P("data"),
                out_specs=P("data"), check_vma=False,
            )(b)

        sec = device_time(step, dev_batch, iters=16, base_iters=2)
        fps = len(batch) / sec
        if base is None:
            base = fps
        eff = fps / (base * n / device_counts[0])
        results.append({"devices": n, "fps": round(fps, 1),
                        "efficiency": round(eff, 3)})
        print(f"devices={n:2d}  fps={fps:10.1f}  efficiency={eff:.3f}")
    print(json.dumps({"scaling": results}))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=None)
    args = ap.parse_args()
    run(args.sizes)
