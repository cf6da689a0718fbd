"""Honest warp-kernel A/B driver (round 4).

jax's pjit fastpath caches executables beyond ``_clear_cache()``, so
in-process monkeypatch A/B silently re-times the first-traced program.
This driver runs each variant in its OWN subprocess (env-keyed knobs),
with long loop-slope measurements and median-of-3 repetitions.

Usage:  python -m benchmarks.warp_ab [geometry]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import os, numpy as np, jax, jax.numpy as jnp
import vacv_tpu.ops.pallas.warp_affine as W
from vacv_tpu.ops.warp_affine import invert_affine, _warp_planes
from vacv_tpu.utils.perf import device_time
from benchmarks.op_bench import _img

T = int(os.environ.get("AB_T", "8"))
W._T = T
geom = os.environ.get("AB_GEOM", "cfg5")
if geom == "cfg5":
    src = _img(1440, 2560, seed=55)
    m = np.array([[0.9, 0.03, 40.0], [-0.03, 0.9, 25.0]], np.float32)
    crop = (36, 1404, 64, 2496); h_out, w_out = 684, 1216
elif geom == "1080p":
    src = _img(1080, 1920, seed=7)
    m = np.array([[0.849158, 0.012257, -74.8], [-0.01225, 0.849158, -79.2]], np.float32)
    crop = (0, 1080, 0, 1920); h_out, w_out = 536, 960
elif geom == "rot20":
    src = _img(1080, 1920, seed=7)
    import math
    a = math.radians(20)
    m = np.array([[0.9*math.cos(a), 0.9*math.sin(a), 30.0],
                  [-0.9*math.sin(a), 0.9*math.cos(a), 160.0]], np.float32)
    crop = (0, 1080, 0, 1920); h_out, w_out = 536, 960
minv = invert_affine(m)
planes = jnp.transpose(jnp.asarray(src)[crop[0]:crop[1], crop[2]:crop[3]], (2, 0, 1))
pb2 = jnp.stack([planes, planes])
h_in, w_in = planes.shape[1], planes.shape[2]

plan = W._plan(minv, 3, h_in, w_in, h_out, w_out, 1, allow_stream=False)
ref = np.clip(np.floor(np.asarray(_warp_planes(
    planes.astype(jnp.float32), minv, h_out, w_out, u8=True,
    border_value=0.0, edge_mode="opencv")) + 1e-4), 0, 255).astype(np.uint8)
out = np.asarray(W.warp_affine_pallas(planes, minv, h_out, w_out, u8=True, border_value=0.0))
diff = np.abs(out.astype(int) - ref.astype(int))

def med(fn, *a, iters):
    return float(np.median([device_time(fn, *a, iters=iters) for _ in range(3)]) * 1e3)

plain = med(lambda i, p: W.warp_affine_pallas(
    p + (i % 2).astype(jnp.uint8), minv, h_out, w_out, u8=True,
    border_value=0.0), planes, iters=128)
vwarp = jax.vmap(lambda p: W.warp_affine_pallas(
    p, minv, h_out, w_out, u8=True, border_value=0.0))
vm = med(lambda i, b: vwarp(b + (i % 2).astype(jnp.uint8)), pb2, iters=64)
print("RESULT " + __import__("json").dumps(dict(
    t=T, geom=geom, plan={k: plan[k] for k in ("rh", "cs", "lb", "rbh")},
    plain_ms=round(plain, 4), vmap_b2_ms=round(vm, 4),
    maxdiff=int(diff.max()), fracdiff=float((diff > 0).mean()))))
"""


def run(geom: str, t: int):
    env = dict(os.environ, AB_T=str(t), AB_GEOM=geom)
    p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=560)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line[7:])
            return json.loads(line[7:])
    print(p.stdout[-2000:], p.stderr[-2000:])
    return None


if __name__ == "__main__":
    geoms = sys.argv[1:] or ["cfg5"]
    for g in geoms:
        for t in (int(os.environ.get('AB_TS','8')),) if os.environ.get('AB_TS') else (8, 16):
            run(g, t)
