"""f32 warp-kernel A/B: "pair" (round-4 per-tap fields x 2-term band
split — 4 dots linear / 8 cubic) vs "fold3" (weights folded into one
split field, lo x lo cross term dropped — 3 dots either way).

Subprocess-per-variant (pjit executable cache survives _clear_cache;
see RESULTS.md round-4 lesson), checksum printed to prove the variant
actually changed semantics.

Run:  python -m benchmarks.warp_f32_ab [linear|cubic]
"""
from __future__ import annotations

import os
import subprocess
import sys

CHILD = r"""
import os, math, numpy as np, jax, jax.numpy as jnp
import vacv_tpu
import vacv_tpu.ops.pallas.warp_affine as W
from vacv_tpu.ops.warp_affine import invert_affine, _warp_planes
from vacv_tpu.utils.perf import device_time
from benchmarks.op_bench import _img

a = math.radians(20)
mf = np.array([[0.9*math.cos(a), 0.9*math.sin(a), 30.0],
               [-0.9*math.sin(a), 0.9*math.cos(a), 20.0]], np.float32)
h, w = 1440, 2560
hh = h - 8
src = _img(h, w, seed=h+20).astype(np.float32)
planes = jnp.transpose(jnp.asarray(src[:hh]), (2, 0, 1))
minv = invert_affine(mf)
interp = os.environ.get("AB_INTERP", "linear")
imode = (vacv_tpu.InterMode.INTER_LINEAR if interp == "linear"
         else vacv_tpu.InterMode.INTER_CUBIC)

ref = np.asarray(_warp_planes(planes, minv, hh, w, u8=False,
                              border_value=0.0, edge_mode="opencv",
                              interp=imode))
out = np.asarray(W.warp_affine_pallas(planes, minv, hh, w, u8=False,
                                      border_value=0.0, interp=interp))
rel = np.abs(out - ref).max() / max(1.0, np.abs(ref).max())
ms = float(np.median([device_time(
    lambda i, p: W.warp_affine_pallas(
        p + (i % 2).astype(jnp.float32), minv, hh, w,
        u8=False, border_value=0.0, interp=interp),
    planes, iters=32) for _ in range(3)]) * 1e3)
print(f"RESULT variant={os.environ.get('VACV_WARP_F32')} "
      f"tlb={os.environ.get('VACV_WARP_TLB')} interp={interp} "
      f"ms={ms:.3f} relerr={rel:.2e} "
      f"cksum={float(np.abs(out).sum()):.6e}", flush=True)
"""

if __name__ == "__main__":
    interp = sys.argv[1] if len(sys.argv) > 1 else "linear"
    combos = [("pair", None), ("fold3", None),
              ("fold3", "8,64"), ("fold3", "8,32"), ("fold3", "16,32")]
    for variant, tlb in combos:
        env = dict(os.environ, VACV_WARP_F32=variant, AB_INTERP=interp)
        env.pop("VACV_WARP_TLB", None)
        if tlb:
            env["VACV_WARP_TLB"] = tlb
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))),
                           capture_output=True, text=True, timeout=900)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line)
        if r.returncode:
            print(f"variant={variant} tlb={tlb} FAILED:",
                  r.stderr.strip().splitlines()[-1] if r.stderr else "?")
