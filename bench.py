#!/usr/bin/env python
"""Headline benchmark: 1080p fused preprocess throughput (frames/s/chip).

Pipeline (BASELINE.json config 4): 1920x1080 BGR u8 -> crop ->
bilinear resize 224x224 -> CHW -> fp32 -> per-image normalize, batched.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

``vs_baseline`` compares against the reference-style CPU implementation
(OpenCV running the identical chain single-threaded on the host — the
reference's oracle and its effective performance envelope).

Timing uses the loop-slope method (``vacv_tpu.utils.perf.device_time``):
K pipeline iterations inside one jitted fori_loop with a scalar
readback, per-iteration time taken as the slope between two K values —
robust against async-dispatch and remote-tunnel artifacts.  The crop
offset varies with the loop index so XLA cannot hoist the body.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BATCH = 32
H, W = 1080, 1920
CROP_LEFT, CROP_TOP = 64, 28
CROP_W, CROP_H = 1792, 1036
OUT = 224


def make_batch(n=BATCH):
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(n, H, W, 3), dtype=np.uint8)


def bench_tpu():
    import jax
    import jax.numpy as jnp

    import vacv_tpu as vc
    from vacv_tpu.core.types import Layout
    from vacv_tpu.ops.crop import crop_dynamic
    from vacv_tpu.ops.normalize import normalize_jnp
    from vacv_tpu.ops.resize import resize
    from vacv_tpu.utils.perf import device_time

    def per_image(x, left):
        img = crop_dynamic(vc.Image(x, Layout.HWC), left, CROP_TOP, CROP_W, CROP_H)
        img = resize(img, (OUT, OUT))
        img = img.change_layout(Layout.CHW)
        img = img.change_dtype(jnp.float32)
        return normalize_jnp(img).data

    def step(i, b):
        # i-dependent crop offset defeats loop-invariant code motion
        left = CROP_LEFT + (i % 2)
        return jax.vmap(lambda x: per_image(x, left))(b)

    # Generate the batch on-device: the benchmark measures preprocessing
    # throughput on HBM-resident frames, and on remote-tunneled TPUs a
    # 190 MB host transfer would crawl through the relay link.
    @jax.jit
    def gen():
        return jax.random.randint(
            jax.random.PRNGKey(0), (BATCH, H, W, 3), 0, 256, jnp.uint8
        )

    dev_batch = jax.block_until_ready(gen())
    sec = device_time(step, dev_batch, iters=32, base_iters=2)
    return BATCH / sec, sec * 1e3


def bench_opencv(batch):
    import cv2

    cv2.setNumThreads(1)  # the reference is a single-core mobile library
    n = min(8, len(batch))
    t0 = time.perf_counter()
    for i in range(n):
        img = batch[i][CROP_TOP : CROP_TOP + CROP_H, CROP_LEFT : CROP_LEFT + CROP_W]
        img = cv2.resize(img, (OUT, OUT), interpolation=cv2.INTER_LINEAR)
        img = img.astype(np.float32)
        m, s = cv2.meanStdDev(img)
        img = (img - m.ravel().astype(np.float32)) / (
            s.ravel().astype(np.float32) + 1e-6
        )
        _ = np.ascontiguousarray(np.transpose(img, (2, 0, 1)))
    dt = time.perf_counter() - t0
    return n / dt, dt / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run per-op table")
    args = ap.parse_args()

    batch = make_batch()
    cv_fps, cv_ms = bench_opencv(batch)
    fps, ms_per_batch = bench_tpu()

    if args.full:
        from benchmarks.op_bench import run_op_table  # noqa

        run_op_table()

    print(
        json.dumps(
            {
                "metric": "1080p fused preprocess throughput",
                "value": round(fps, 1),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / cv_fps, 2),
                "detail": {
                    "batch": BATCH,
                    "ours_ms_per_batch": round(ms_per_batch, 3),
                    "opencv_1thread_fps": round(cv_fps, 1),
                    "opencv_ms_per_frame": round(cv_ms, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
