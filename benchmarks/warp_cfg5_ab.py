"""Round-5 closing A/B: the cfg5 vmapped warp's plan + variant space.

ROUND5_NOTES records the cfg5 warp at 0.49 ms against a 0.31 ms
dot-MAC bound (2*128*24 MACs/output at the t8/lb64/rh24 plan) — the
~0.18 ms gap is per-block overhead (dynamic roll, field builds,
vertical reduces, masked stores).  This driver sweeps the plan and
variant knobs on the EXACT cfg5 call pattern (vmap-b2 over c=3 planes,
the shard_batched inner shape) in one subprocess per variant
(pjit's executable cache makes in-process A/B lie; see RESULTS.md).

Usage:  python -m benchmarks.warp_cfg5_ab [variant ...]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, numpy as np, jax, jax.numpy as jnp
from vacv_tpu import config as _vc
_vc.enable_compile_cache()
import vacv_tpu.ops.pallas.warp_affine as W
from vacv_tpu.ops.warp_affine import invert_affine, _warp_planes
from vacv_tpu.utils.perf import device_time
from benchmarks.op_bench import _img

src = _img(1440, 2560, seed=55)
m = np.array([[0.9, 0.03, 40.0], [-0.03, 0.9, 25.0]], np.float32)
minv = invert_affine(m)
h_out, w_out = 684, 1216
planes = jnp.transpose(jnp.asarray(src)[36:1404, 64:2496], (2, 0, 1))
pb2 = jnp.stack([planes, planes])
h_in, w_in = planes.shape[1], planes.shape[2]

plan = W._plan(minv, 3, h_in, w_in, h_out, w_out, 1, allow_stream=False)
ref = np.clip(np.floor(np.asarray(_warp_planes(
    planes.astype(jnp.float32), minv, h_out, w_out, u8=True,
    border_value=0.0, edge_mode="opencv")) + 1e-4), 0, 255).astype(np.uint8)
out = np.asarray(W.warp_affine_pallas(planes, minv, h_out, w_out,
                                      u8=True, border_value=0.0))
diff = np.abs(out.astype(int) - ref.astype(int))

def med(fn, *a, iters):
    return float(np.median([device_time(fn, *a, iters=iters) for _ in range(3)]) * 1e3)

vwarp = jax.vmap(lambda p: W.warp_affine_pallas(
    p, minv, h_out, w_out, u8=True, border_value=0.0))
vm = med(lambda i, b: vwarp(b + (i % 2).astype(jnp.uint8)), pb2, iters=64)
# round-5 fold: both frames in ONE off-vmap c=6 call
p6 = jnp.concatenate([planes, planes], axis=0)
c6 = med(lambda i, p: W.warp_affine_pallas(
    p + (i % 2).astype(jnp.uint8), minv, h_out, w_out, u8=True,
    border_value=0.0), p6, iters=64)
plan6 = W._plan(minv, 6, h_in, w_in, h_out, w_out, 1, allow_stream=True)

# full cfg5 chain, old (vmap per-image) vs new (warp_folded_batch)
from vacv_tpu.core.types import Layout, VRect
from vacv_tpu.models import PreprocessConfig, Preprocessor
pre5 = Preprocessor(PreprocessConfig(
    crop_rect=VRect(64, 36, 2496, 1404),
    warp=(tuple(map(tuple, m)), (1216, 684)),
    out_size=(224, 224), out_layout=Layout.CHW, normalize=True))
batch2 = jnp.stack([jnp.asarray(src), jnp.asarray(src)])
oldc = jax.jit(jax.vmap(pre5.fn))
newc = jax.jit(pre5.batch_fn)
assert pre5.describe_route(batch2.shape[1:]) == "warp_folded_batch"
old_ms = med(lambda i, b: oldc(b + (i % 2).astype(jnp.uint8)), batch2,
             iters=32)
new_ms = med(lambda i, b: newc(b + (i % 2).astype(jnp.uint8)), batch2,
             iters=32)
chain_dev = float(jnp.max(jnp.abs(oldc(batch2) - newc(batch2))))

print("RESULT " + json.dumps(dict(
    variant=os.environ.get("AB_NAME", "?"),
    plan={k: plan[k] for k in ("t", "lb", "rh", "cs", "kw", "rbh")},
    plan6={k: plan6[k] for k in ("t", "lb", "rh", "cs", "kw", "rbh")},
    vmap_b2_ms=round(vm, 4), c6_ms=round(c6, 4),
    plain_ms=0.0,
    chain_old_ms=round(old_ms, 4), chain_new_ms=round(new_ms, 4),
    chain_maxdev=chain_dev,
    maxdiff=int(diff.max()), fracdiff=float((diff > 0).mean()),
    checksum=int(out.astype(np.int64).sum()))))
"""

VARIANTS = {
    # name -> extra env
    "default": {},
    "t8lb64": {"VACV_WARP_TLB": "8,64"},
    "t8lb32": {"VACV_WARP_TLB": "8,32"},
    "t16lb64": {"VACV_WARP_TLB": "16,64"},
    "t16lb32": {"VACV_WARP_TLB": "16,32"},
    "fold_t8lb64": {"VACV_WARP_TLB": "8,64",
                    "VACV_WARP_VARIANT": "foldbf16"},
    "int_t8lb64": {"VACV_WARP_TLB": "8,64", "VACV_WARP_VARIANT": "int"},
    "inthf32_t8lb64": {"VACV_WARP_TLB": "8,64",
                       "VACV_WARP_VARIANT": "inthf32"},
}


def run(name: str):
    env = dict(os.environ, AB_NAME=name, **VARIANTS[name])
    p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=560)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line[7:])
            return json.loads(line[7:])
    print(p.stdout[-2000:], p.stderr[-2000:])
    return None


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        run(n)
