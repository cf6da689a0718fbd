#!/usr/bin/env python
"""Headline benchmark: 1080p fused preprocess throughput (frames/s/chip).

Pipeline (BASELINE.json config 4): 1920x1080 BGR u8 -> crop ->
bilinear resize 224x224 -> CHW -> fp32 -> per-image normalize, batched.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

``vs_baseline`` compares against the reference-style CPU implementation
(OpenCV running the identical chain single-threaded on the host — the
reference's oracle and its effective performance envelope).

Two device paths are measured and the faster one is the headline:

* the XLA pipeline (crop -> resize matmuls -> normalize, fused by XLA),
  timed with the loop-slope method (``vacv_tpu.utils.perf.device_time``:
  K iterations inside one jitted fori_loop with a traced K and a scalar
  readback; slope between two K values cancels dispatch/transfer
  constants — required on remote-tunneled TPUs where host wall-clock
  is fake);
* the fused Pallas preprocess kernel (one HBM pass), timed with a
  loop-free *batch-slope*: the jitted kernel runs at two batch sizes
  with a scalar readback each, and the per-frame time is the slope
  over the batch delta — same constant-cancelling idea without
  wrapping the DMA kernel in a fori_loop (a shape the remote compile
  service handles poorly).
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


def _gen_device_batch(n):
    import jax
    import jax.numpy as jnp

    # Generate the batch on-device: the benchmark measures preprocessing
    # throughput on HBM-resident frames, and on remote-tunneled TPUs a
    # 190 MB host transfer would crawl through the relay link.
    @jax.jit
    def gen():
        return jax.random.randint(
            jax.random.PRNGKey(0), (n, H, W, 3), 0, 256, jnp.uint8
        )

    return jax.block_until_ready(gen())


def bench_jnp_path():
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

    dev_batch = _gen_device_batch(BATCH)
    sec = device_time(step, dev_batch, iters=32, base_iters=2)
    return BATCH / sec, sec / BATCH


def bench_fused_kernel(r_small=2, r_big=18, reps=24):
    """Unroll-slope timing of the fused Pallas kernel: R data-chained
    kernel invocations inside one jitted program (no fori_loop — a
    shape the remote compile service mishandles for DMA kernels), with
    a scalar readback forcing execution.  Per-batch time is the slope
    between the R_small and R_big programs; the dispatch/readback
    constant cancels, and the chained ``top`` offset (derived from the
    previous iteration's checksum) defeats CSE/hoisting.

    Estimator (round 5, the figure of record): **min-aggregate slope**
    ``(min_i t_big_i − min_i t_small_i) / (R_big − R_small)`` over
    ``reps`` interleaved samples.  Host-side noise on the tunnel is
    one-sided (starvation/drift only ever ADD time), so the per-R
    minima converge on the true floor, and differencing the floors is
    robust in BOTH directions — unlike the round-4 median-of-paired-
    slopes, which under-measured when the host clock drifted *between*
    the two samples of a pair (the round-4 driver capture read
    0.258 ms/batch, below the kernel's own ~0.36 ms HBM-read floor at
    the measured 540 GB/s u8 rate).  The paired-slope median is still
    computed as a cross-check; ``spread_pct`` reports the disagreement
    between the two estimators."""
    import jax
    import jax.numpy as jnp

    import vacv_tpu as vc
    from vacv_tpu.ops.pallas.preprocess import (
        plan_supported, preprocess_fused_batch,
    )

    if not plan_supported(H, W, CROP_LEFT, CROP_W, CROP_H, OUT, OUT):
        return None

    rect = vc.VRect(CROP_LEFT, CROP_TOP, CROP_LEFT + CROP_W, CROP_TOP + CROP_H)

    def make_fn(r):
        @jax.jit
        def many(b):
            acc = jnp.float32(0.0)
            for _ in range(r):
                top = CROP_TOP + (jnp.abs(acc).astype(jnp.int32) % 2)
                out = preprocess_fused_batch(b, rect, (OUT, OUT), top=top)
                acc = acc + jnp.sum(out, dtype=jnp.float32)
            return acc

        return many

    b = _gen_device_batch(BATCH)

    def once(fn):
        t0 = time.perf_counter()
        float(fn(b))  # scalar readback forces execution
        return time.perf_counter() - t0

    f_small = make_fn(r_small)
    f_big = make_fn(r_big)
    once(f_small)
    once(f_big)  # compile + warm both
    t_small, t_big, slopes = [], [], []
    for _ in range(reps):
        ts = once(f_small)
        tb = once(f_big)
        t_small.append(ts)
        t_big.append(tb)
        slopes.append(max((tb - ts) / (r_big - r_small), 1e-9))
    per_batch = max(
        (min(t_big) - min(t_small)) / (r_big - r_small), 1e-9
    )
    pair_median = float(np.median(slopes))
    return {
        "fps": BATCH / per_batch,
        "sec_per_batch": per_batch,
        "fps_pair_median": BATCH / pair_median,
        "spread_pct": round(
            100.0 * abs(pair_median - per_batch) / per_batch, 1
        ),
    }


def bench_opencv(batch, rounds=3):
    import cv2

    cv2.setNumThreads(1)  # the reference is a single-core mobile library
    n = min(8, len(batch))
    best = float("inf")
    for _ in range(rounds):  # min-of-rounds rejects host-load noise
        t0 = time.perf_counter()
        for i in range(n):
            img = batch[i][
                CROP_TOP : CROP_TOP + CROP_H, CROP_LEFT : CROP_LEFT + CROP_W
            ]
            img = cv2.resize(img, (OUT, OUT), interpolation=cv2.INTER_LINEAR)
            img = img.astype(np.float32)
            m, s = cv2.meanStdDev(img)
            img = (img - m.ravel().astype(np.float32)) / (
                s.ravel().astype(np.float32) + 1e-6
            )
            _ = np.ascontiguousarray(np.transpose(img, (2, 0, 1)))
        best = min(best, time.perf_counter() - t0)
    return n / best, best / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run per-op table")
    ap.add_argument("--jnp-only", action="store_true",
                    help="skip the fused-kernel measurement")
    args = ap.parse_args()

    from vacv_tpu import config as vconfig

    vconfig.enable_compile_cache()

    batch = make_batch()
    cv_fps, cv_ms = bench_opencv(batch)
    jnp_fps, jnp_sec = bench_jnp_path()

    fused = None
    if not args.jnp_only:
        try:
            # Median of 3 measurement blocks: the tunneled chip's
            # effective bandwidth wanders ±8% over tens of seconds
            # (single blocks read 84.7/98.6/85.0 kfps back to back,
            # each internally consistent to <4%); the median block
            # keeps three consecutive driver runs within ±10%.
            blocks = [bench_fused_kernel() for _ in range(3)]
            blocks.sort(key=lambda f: f["fps"])
            fused = blocks[1]
            fused["block_fps"] = [round(f["fps"], 1) for f in blocks]
        except Exception as e:  # pragma: no cover - defensive: keep the
            print(f"# fused path failed: {e!r}", file=sys.stderr)

    if fused and fused["fps"] > jnp_fps:
        fps, path = fused["fps"], "pallas_fused"
        ms_per_batch = fused["sec_per_batch"] * 1e3
    else:
        fps, path = jnp_fps, "xla_pipeline"
        ms_per_batch = jnp_sec * BATCH * 1e3

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
                    "path": path,
                    "ours_ms_per_batch": round(ms_per_batch, 3),
                    "xla_pipeline_fps": round(jnp_fps, 1),
                    "pallas_fused_fps": (
                        round(fused["fps"], 1) if fused else None
                    ),
                    "pallas_fused_fps_pair_median": (
                        round(fused["fps_pair_median"], 1) if fused else None
                    ),
                    "rep_spread_pct": (
                        fused["spread_pct"] if fused else None
                    ),
                    "block_fps": fused.get("block_fps") if fused else None,
                    "opencv_1thread_fps": round(cv_fps, 1),
                    "opencv_ms_per_frame": round(cv_ms, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
