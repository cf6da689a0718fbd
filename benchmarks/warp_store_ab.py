"""Interleaved A/B for warp store modes / variants (round 5).

The tunnel's timing drift (±20% over minutes) swamps single runs, so
this driver interleaves subprocess runs A,B,A,B,... and reports the
per-variant medians side by side.

Usage:
  python -m benchmarks.warp_store_ab STORE rows i32rows [reps]
  python -m benchmarks.warp_store_ab VARIANT pair foldbf16 [reps]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

CHILD = r"""
import os, numpy as np, jax, jax.numpy as jnp
from jax import lax
import vacv_tpu as vc
from vacv_tpu.core.types import InterMode, Layout
from vacv_tpu.utils.perf import device_time
rng = np.random.default_rng(5)
h, w = 1080, 1920
src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
m = np.array([[0.85, 0.05, w*0.02], [-0.05, 0.85, h*0.02]], np.float32)
srcj = jax.device_put(jnp.asarray(src))
flags = getattr(InterMode, os.environ.get("AB_FLAGS", "INTER_LINEAR"))
def step(i, b, mm=m):
    win = lax.dynamic_slice(b, (8*(i%2), 0, 0), (h-8, w, 3))
    return vc.warp_affine(vc.Image(win, Layout.HWC), mm, (w//2, h//2),
                          flags=flags).data
vals = [device_time(step, srcj, iters=128) * 1e3 for _ in range(3)]
print("RESULT " + __import__("json").dumps(dict(ms=round(min(vals), 4))))
"""


def run_one(key: str, value: str) -> float | None:
    env = dict(os.environ)
    env[f"VACV_WARP_{key}"] = value
    p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=560)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])["ms"]
    print(p.stdout[-800:], p.stderr[-800:])
    return None


def main():
    key = sys.argv[1]
    variants = []
    reps = 3
    for a in sys.argv[2:]:
        if a.isdigit():
            reps = int(a)
        else:
            variants.append(a)
    res = {v: [] for v in variants}
    for r in range(reps):
        for v in variants:
            ms = run_one(key, v)
            if ms is not None:
                res[v].append(ms)
                print(f"  [{r}] {v}: {ms:.4f} ms", flush=True)
    for v in variants:
        if res[v]:
            print(f"{v}: median {statistics.median(res[v]):.4f} ms "
                  f"(n={len(res[v])}, {min(res[v]):.4f}-{max(res[v]):.4f})")


if __name__ == "__main__":
    main()
