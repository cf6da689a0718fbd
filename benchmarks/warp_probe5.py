"""Round-5 warp-kernel stage budget: ablate ONE stage at a time.

Round-4's probe asked "dots vs epilogue" at cfg5 geometry; this one
breaks the LADDER geometry (1080p u8 -> 960x540, op_bench matrix) into
roll / fields / dots / vertical / coords / epilogue by deleting each
stage from an inlined copy of the pair-path kernel.  Ablated variants
compute WRONG output on purpose (checksum printed as proof the patch
took); only the deltas vs base are meaningful.

Each variant runs in its own subprocess (pjit's executable cache
defeats in-process A/B — round-4 lesson).

Usage:  python -m benchmarks.warp_probe5 [variants...]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r'''
import os, functools, json, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import vacv_tpu.ops.pallas.warp_affine as W
from vacv_tpu.ops.warp_affine import invert_affine
from vacv_tpu.utils.perf import device_time

variant = os.environ["PROBE_VARIANT"]

def probe_kernel(src_ref, out_ref, *scratch, m, h_in, w_in, t, lb, rh, nb, cs,
                 h_pad, w_pad, rbh, u8, bv, ns, interp):
    s = pl.program_id(1)
    m0, m1, m2, m3, m4, m5_ = (jnp.float32(v) for v in m)
    jc = jax.lax.broadcasted_iota(jnp.int32, (1, t * lb), 1)
    trow_f = (jc // lb).astype(jnp.float32)
    lane_f = (jc % lb).astype(jnp.float32)
    dy = (s * t).astype(jnp.float32) + trow_f
    dd = jax.lax.broadcasted_iota(jnp.int32, (rh, t * lb), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (W._KW, t * lb), 0)
    fdt = jnp.bfloat16
    for b in range(nb):
        if variant == "nocoord":
            sx = jnp.full((1, t * lb), b * lb, jnp.int32)
            sy = jnp.full((1, t * lb), 8 * (b % 4), jnp.int32)
            ax = ay = jnp.full((1, t * lb), 0.5, jnp.float32)
        else:
            dx = jnp.float32(b * lb) + lane_f
            fx = jnp.clip(m0 * dx + m1 * dy + m2, -1e6, 1e6)
            fy = jnp.clip(m3 * dx + m4 * dy + m5_, -1e6, 1e6)
            sx = jnp.floor(fx).astype(jnp.int32)
            sy = jnp.floor(fy).astype(jnp.int32)
            ax = jnp.clip(fx - sx.astype(jnp.float32), 0.0, 1.0)
            ay = jnp.clip(fy - sy.astype(jnp.float32), 0.0, 1.0)
        wx0 = W._quantize_q11(1.0 - ax); wx1 = 1.0 - wx0
        wy0 = W._quantize_q11(1.0 - ay); wy1 = 1.0 - wy0
        x0_ok = ((sx >= 0) & (sx <= w_in - 1)).astype(jnp.float32)
        x1_ok = ((sx >= -1) & (sx + 1 <= w_in - 1)).astype(jnp.float32)
        y0_ok = ((sy >= 0) & (sy <= h_in - 1)).astype(jnp.float32)
        y1_ok = ((sy >= -1) & (sy + 1 <= h_in - 1)).astype(jnp.float32)
        c1 = jnp.minimum(jnp.clip(jnp.min(sx), 0, None), w_pad - 127)
        c_al = jnp.minimum((c1 // 128) * 128, w_pad - 256)
        c_al = pl.multiple_of(c_al, 128)
        d = c1 - c_al
        syc = jnp.clip(sy, 0, h_in - 1)
        r0 = jnp.minimum((jnp.min(syc) // 8) * 8, h_pad - rh)
        r0 = pl.multiple_of(r0, 8)
        def load(ci):
            return src_ref[ci, pl.ds(r0, rh), pl.ds(c_al, 256)].astype(jnp.int32)
        band256 = jnp.concatenate([load(ci) for ci in range(cs)], axis=0)
        if variant == "noroll":
            band = band256[:, :W._KW]
        else:
            band = pltpu.roll(band256, (256 - d) % 256, 1)[:, :W._KW]
        sx_rel = sx - c1
        sy_rel = sy - r0
        bb = band.astype(fdt)
        if variant == "nofield":
            G0 = (cc == 17).astype(fdt)
            G1 = (cc == 18).astype(fdt)
        else:
            G0 = (cc == sx_rel).astype(fdt)
            G1 = (cc == sx_rel + 1).astype(fdt)
        p0 = jnp.dot(bb, G0, preferred_element_type=jnp.float32)
        if variant == "onedot":
            p1 = p0
        else:
            p1 = jnp.dot(bb, G1, preferred_element_type=jnp.float32)
        wx0v = wx0 * x0_ok; wx1v = wx1 * x1_ok
        wy0v = wy0 * y0_ok; wy1v = wy1 * y1_ok
        wsum = (wx0 * x0_ok + wx1 * x1_ok) * (wy0 * y0_ok + wy1 * y1_ok)
        backfill = (1.0 - wsum) * jnp.float32(bv)
        if variant != "novert":
            wv = jnp.where(dd == sy_rel, wy0v, 0.0) + jnp.where(dd == sy_rel + 1, wy1v, 0.0)
        for ci in range(cs):
            rs = slice(ci * rh, (ci + 1) * rh)
            if variant == "novert":
                s0 = p0[ci * rh : ci * rh + 1]
                s1 = p1[ci * rh : ci * rh + 1]
            else:
                s0 = jnp.sum(wv * p0[rs], axis=0, keepdims=True)
                s1 = jnp.sum(wv * p1[rs], axis=0, keepdims=True)
            acc = wx0v * s0 + wx1v * s1 + backfill
            if variant == "noepi":
                acc = acc.astype(jnp.int32).astype(jnp.uint8)
            else:
                acc = jnp.clip(jnp.floor(acc + 1e-4), 0, 255)
                acc = acc.astype(jnp.int32).astype(jnp.uint8)
            for trow in range(t):
                out_ref[ci, trow, b * lb : (b + 1) * lb] = acc[0, trow * lb : (trow + 1) * lb]

W._kernel = probe_kernel

rng = np.random.default_rng(5)
h, w = 1080, 1920
src = rng.integers(0, 256, (h - 8, w, 3), dtype=np.uint8)
m = np.array([[0.85, 0.05, w * 0.02], [-0.05, 0.85, h * 0.02]], np.float32)
minv = invert_affine(m)
planes = jnp.transpose(jnp.asarray(src), (2, 0, 1))
out = np.asarray(W.warp_affine_pallas(planes, minv, h // 2, w // 2,
                                      u8=True, border_value=0.0))

def med(fn, *a, iters):
    return float(np.median([device_time(fn, *a, iters=iters) for _ in range(3)]) * 1e3)

plain = med(lambda i, p: W.warp_affine_pallas(
    p + (i % 2).astype(jnp.uint8), minv, h // 2, w // 2, u8=True,
    border_value=0.0), planes, iters=128)
print("RESULT " + json.dumps(dict(variant=variant, plain_ms=round(plain, 4),
                                  checksum=int(out.astype(np.int64).sum()))))
'''


def run(variant: str):
    env = dict(os.environ, PROBE_VARIANT=variant,
               VACV_WARP_VARIANT="pair")
    p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=560)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line[7:])
            return json.loads(line[7:])
    print(p.stdout[-1500:], p.stderr[-1500:])
    return None


ALL = ("base", "noroll", "nofield", "onedot", "novert", "nocoord",
       "noepi")

if __name__ == "__main__":
    res = {}
    for v in (sys.argv[1:] or ALL):
        r = run(v)
        if r:
            res[v] = r
    if "base" in res:
        base = res["base"]["plain_ms"]
        for v, r in res.items():
            if v != "base":
                print(f"{v}: delta={base - r['plain_ms']:+.4f} ms "
                      f"(of {base:.4f})")
