"""Round-5 probe #2: which DYNAMIC index is expensive?

probe5 showed removing the coordinate chain saved 78%, but that
ablation also constant-folded the roll distance and the band slice
offsets.  After hoisting the vector chain (no win), this probe
isolates, on the hoisted kernel: dynamic roll distance (statd),
dynamic column slice (statcal), dynamic row slice (statr0), and all
three (allstat).  Checksums differ from base BY DESIGN.

Usage:  python -m benchmarks.warp_probe6 [variants...]
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
STATD = variant in ("statd", "allstat")
STATCAL = variant in ("statcal", "allstat")
STATR0 = variant in ("statr0", "allstat")
ROLLG1 = variant in ("rollg1", "catg1", "bf16roll", "bf16rollwv", "k96roll")
BF16CMP = variant in ("bf16cmp", "bf16roll", "bf16rollwv")
BF16WV = variant in ("bf16wv", "bf16rollwv")
K96 = variant in ("k96", "k96roll")

def probe_kernel(src_ref, out_ref, *scratch, m, h_in, w_in, t, lb, rh, nb, cs,
                 h_pad, w_pad, rbh, u8, bv, ns, interp):
    s = pl.program_id(1)
    m0, m1, m2, m3, m4, m5_ = (jnp.float32(v) for v in m)
    bi = jax.lax.broadcasted_iota(jnp.int32, (nb, t * lb), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (nb, t * lb), 1)
    trow_f = (jc // lb).astype(jnp.float32)
    lane_f = ((bi * lb) + (jc % lb)).astype(jnp.float32)
    dy = (s * t).astype(jnp.float32) + trow_f
    dd = jax.lax.broadcasted_iota(jnp.int32, (rh, t * lb), 0)
    KW = 96 if K96 else W._KW
    cc = jax.lax.broadcasted_iota(jnp.int32, (KW, t * lb), 0)
    ccb = cc.astype(jnp.bfloat16)
    ddb = dd.astype(jnp.bfloat16)
    fdt = jnp.bfloat16
    fx = jnp.clip(m0 * lane_f + m1 * dy + m2, -1e6, 1e6)
    fy = jnp.clip(m3 * lane_f + m4 * dy + m5_, -1e6, 1e6)
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
    wx0v = wx0 * x0_ok; wx1v = wx1 * x1_ok
    wy0v = wy0 * y0_ok; wy1v = wy1 * y1_ok
    wsum = (wx0v + wx1v) * (wy0v + wy1v)
    backfill_all = (1.0 - wsum) * jnp.float32(bv)
    y0c = (s * t).astype(jnp.float32)
    y1c = y0c + jnp.float32(t - 1)

    for b in range(nb):
        x0c = jnp.float32(b * lb); x1c = jnp.float32(b * lb + lb - 1)
        fxc = [m0 * xx + m1 * yy + m2 for xx in (x0c, x1c) for yy in (y0c, y1c)]
        fyc = [m3 * xx + m4 * yy + m5_ for xx in (x0c, x1c) for yy in (y0c, y1c)]
        sxm = jnp.floor(jnp.minimum(jnp.minimum(fxc[0], fxc[1]),
                                    jnp.minimum(fxc[2], fxc[3]))).astype(jnp.int32) - 1
        sym = jnp.floor(jnp.minimum(jnp.minimum(fyc[0], fyc[1]),
                                    jnp.minimum(fyc[2], fyc[3]))).astype(jnp.int32) - 1
        c1 = jnp.minimum(jnp.maximum(sxm, 0), w_pad - 127)
        if STATCAL:
            c_al = max(0, min((b * lb) // 128 * 128 - 128, w_pad - 256))
        else:
            c_al = pl.multiple_of(jnp.minimum((c1 // 128) * 128, w_pad - 256), 128)
        d = c1 - c_al
        syc_min = jnp.clip(sym, 0, h_in - 1)
        if STATR0:
            r0 = max(0, min(8 * (b % 3), h_pad - rh))
        elif variant == "r0free":
            r0 = jnp.minimum(syc_min, h_pad - rh)
        else:
            r0 = pl.multiple_of(jnp.minimum((syc_min // 8) * 8, h_pad - rh), 8)
        def load(ci):
            return src_ref[ci, pl.ds(r0, rh), pl.ds(c_al, 256)].astype(jnp.int32)
        if variant in ("perchan", "r3reshape"):
            if variant == "r3reshape":
                band256 = src_ref[:, pl.ds(r0, rh), pl.ds(c_al, 256)
                                  ].astype(jnp.int32).reshape(cs * rh, 256)
                bands = [pltpu.roll(band256, (256 - d) % 256, 1)[:, :KW]]
            else:
                bands = [pltpu.roll(load(ci), (256 - d) % 256, 1)[:, :KW]
                         for ci in range(cs)]
        else:
            band256 = jnp.concatenate([load(ci) for ci in range(cs)], axis=0)
            if STATD:
                bands = [pltpu.roll(band256, 13, 1)[:, :KW]]
            else:
                bands = [pltpu.roll(band256, (256 - d) % 256, 1)[:, :KW]]
        sx_rel = sx[b:b+1] - c1
        sy_rel = sy[b:b+1] - r0
        bbs = [bd.astype(fdt) for bd in bands]
        bb = bbs[0]
        if BF16CMP:
            G0 = (ccb == sx_rel.astype(jnp.bfloat16)).astype(fdt)
        else:
            G0 = (cc == sx_rel).astype(fdt)
        if ROLLG1:
            G1 = jnp.concatenate([G0[-1:], G0[:-1]], axis=0)
        elif BF16CMP:
            G1 = (ccb == (sx_rel + 1).astype(jnp.bfloat16)).astype(fdt)
        else:
            G1 = (cc == sx_rel + 1).astype(fdt)
        if variant == "perchan":
            p0s = [jnp.dot(x, G0, preferred_element_type=jnp.float32) for x in bbs]
            p1s = [jnp.dot(x, G1, preferred_element_type=jnp.float32) for x in bbs]
        else:
            p0 = jnp.dot(bb, G0, preferred_element_type=jnp.float32)
            p1 = jnp.dot(bb, G1, preferred_element_type=jnp.float32)
        if BF16WV:
            syb = sy_rel.astype(jnp.bfloat16)
            wv = (jnp.where(ddb == syb, wy0v[b:b+1], 0.0)
                  + jnp.where(ddb == syb + 1, wy1v[b:b+1], 0.0))
        else:
            wv = (jnp.where(dd == sy_rel, wy0v[b:b+1], 0.0)
                  + jnp.where(dd == sy_rel + 1, wy1v[b:b+1], 0.0))
        for ci in range(cs):
            rs = slice(ci * rh, (ci + 1) * rh)
            if variant == "perchan":
                s0 = jnp.sum(wv * p0s[ci], axis=0, keepdims=True)
                s1 = jnp.sum(wv * p1s[ci], axis=0, keepdims=True)
            else:
                s0 = jnp.sum(wv * p0[rs], axis=0, keepdims=True)
                s1 = jnp.sum(wv * p1[rs], axis=0, keepdims=True)
            acc = wx0v[b:b+1] * s0 + wx1v[b:b+1] * s1 + backfill_all[b:b+1]
            acc = jnp.clip(jnp.floor(acc + 1e-4), 0, 255)
            acc = acc.astype(jnp.int32).astype(jnp.uint8)
            if variant == "reshapestore":
                out_ref[ci, :, b * lb : (b + 1) * lb] = acc.reshape(t, lb)
            else:
                for trow in range(1 if variant == "onewrite" else t):
                    out_ref[ci, trow, b * lb : (b + 1) * lb] = acc[0, trow * lb : (trow + 1) * lb]

W._kernel = probe_kernel
if variant == "r0free":
    _orig_plan = W._plan
    def _patched2(*a, **k):
        pp = _orig_plan(*a, **k)
        if pp and pp["rbh"] == 0:
            pp["rh"] = 32
        return pp
    W._plan = _patched2
if variant.startswith("rh"):
    _orig_plan = W._plan
    def _patched(*a, **k):
        pp = _orig_plan(*a, **k)
        if pp and pp["rbh"] == 0:
            pp["rh"] = int(variant[2:])
        return pp
    W._plan = _patched

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


ALL = ("base", "rollg1", "bf16cmp", "bf16roll", "bf16rollwv", "k96", "k96roll")

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
