"""Warp-kernel bottleneck probe (round 4): MXU dots vs VPU epilogue.

Each variant runs in its own subprocess (pjit's executable cache defeats
in-process monkeypatching).  Variants that change semantics are sanity-
checked to actually produce different output (proof the patch took).

Usage:  python -m benchmarks.warp_probe
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r'''
import os, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import vacv_tpu.ops.pallas.warp_affine as W
from vacv_tpu.ops.warp_affine import invert_affine
from vacv_tpu.utils.perf import device_time
from benchmarks.op_bench import _img

variant = os.environ["PROBE_VARIANT"]

def probe_kernel(src_ref, out_ref, *scratch, m, h_in, w_in, t, lb, rh, nb, cs,
                 h_pad, w_pad, rbh, u8, bv, ns, nearest):
    s = pl.program_id(1)
    m0, m1, m2, m3, m4, m5_ = (jnp.float32(v) for v in m)
    jc = jax.lax.broadcasted_iota(jnp.int32, (1, t * lb), 1)
    trow_f = (jc // lb).astype(jnp.float32)
    lane_f = (jc % lb).astype(jnp.float32)
    dy = (s * t).astype(jnp.float32) + trow_f
    dd = jax.lax.broadcasted_iota(jnp.int32, (rh, t * lb), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (W._KW, t * lb), 0)
    if variant == "gcat":
        cc2 = jax.lax.broadcasted_iota(jnp.int32, (W._KW, 2 * t * lb), 0)
        jc2 = jax.lax.broadcasted_iota(jnp.int32, (W._KW, 2 * t * lb), 1)
    fdt = jnp.bfloat16
    for b in range(nb):
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
        band = pltpu.roll(band256, (256 - d) % 256, 1)[:, :W._KW]
        sx_rel = sx - c1
        sy_rel = sy - r0
        bb = band.astype(fdt)
        if variant == "gcat":
            # ONE dot over a concatenated field: cols [0,tlb) key
            # sx_rel, cols [tlb,2tlb) key sx_rel+1.
            key = jnp.concatenate([sx_rel, sx_rel + 1], axis=1)
            Gc = (cc2 == key).astype(fdt)
            p = jnp.dot(bb, Gc, preferred_element_type=jnp.float32)
            p0 = p[:, : t * lb]
            p1 = p[:, t * lb :]
        else:
            G0 = (cc == sx_rel).astype(fdt)
            G1 = (cc == sx_rel + 1).astype(fdt)
            p0 = jnp.dot(bb, G0, preferred_element_type=jnp.float32)
            p1 = jnp.dot(bb, G1, preferred_element_type=jnp.float32)
        if variant == "nomask":
            wx0v, wx1v, wy0v, wy1v = wx0, wx1, wy0, wy1
            backfill = jnp.float32(0.0)
        else:
            wx0v = wx0 * x0_ok; wx1v = wx1 * x1_ok
            wy0v = wy0 * y0_ok; wy1v = wy1 * y1_ok
            wsum = (wx0 * x0_ok + wx1 * x1_ok) * (wy0 * y0_ok + wy1 * y1_ok)
            backfill = (1.0 - wsum) * jnp.float32(bv)
        wv = jnp.where(dd == sy_rel, wy0v, 0.0) + jnp.where(dd == sy_rel + 1, wy1v, 0.0)
        for ci in range(cs):
            rs = slice(ci * rh, (ci + 1) * rh)
            s0 = jnp.sum(wv * p0[rs], axis=0, keepdims=True)
            s1 = jnp.sum(wv * p1[rs], axis=0, keepdims=True)
            acc = wx0v * s0 + wx1v * s1 + backfill
            acc = jnp.clip(jnp.floor(acc + 1e-4), 0, 255)
            acc = acc.astype(jnp.int32).astype(jnp.uint8)
            for trow in range(t):
                out_ref[ci, trow, b * lb : (b + 1) * lb] = acc[0, trow * lb : (trow + 1) * lb]

if variant != "base":
    W._kernel = probe_kernel

src = _img(1440, 2560, seed=55)
m = np.array([[0.9, 0.03, 40.0], [-0.03, 0.9, 25.0]], np.float32)
minv = invert_affine(m)
planes = jnp.transpose(jnp.asarray(src)[36:1404, 64:2496], (2, 0, 1))
out = np.asarray(W.warp_affine_pallas(planes, minv, 684, 1216, u8=True, border_value=0.0))

def med(fn, *a, iters):
    return float(np.median([device_time(fn, *a, iters=iters) for _ in range(3)]) * 1e3)

plain = med(lambda i, p: W.warp_affine_pallas(
    p + (i % 2).astype(jnp.uint8), minv, 684, 1216, u8=True,
    border_value=0.0), planes, iters=128)
import json
print("RESULT " + json.dumps(dict(variant=variant, plain_ms=round(plain, 4),
                                  checksum=int(out.astype(np.int64).sum()))))
'''


def run(variant: str):
    env = dict(os.environ, PROBE_VARIANT=variant)
    p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=560)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line[7:])
            return json.loads(line[7:])
    print(p.stdout[-1500:], p.stderr[-1500:])
    return None


if __name__ == "__main__":
    res = {}
    import sys
    for v in (sys.argv[1:] or ["base", "nomask"]):
        r = run(v)
        if r:
            res[v] = r
    if "base" in res:
        for v, r in res.items():
            same = r["checksum"] == res["base"]["checksum"]
            print(f"{v}: semantics_match_base={same}")
