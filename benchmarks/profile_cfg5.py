"""Round-4 decomposition of BASELINE config 5 (warp + full pipeline).

Times each stage of the config-5 chain on device to locate where the
1.546 ms/2-frame batch goes, plus candidate planar variants.

Run:  python -m benchmarks.profile_cfg5
"""
from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import vacv_tpu as vc
    from vacv_tpu.core.types import InterMode, Layout, VRect
    from vacv_tpu.models import PreprocessConfig, Preprocessor
    from vacv_tpu.ops.resize import resize_planes
    from vacv_tpu.ops.warp_affine import invert_affine
    from vacv_tpu.ops.pallas.warp_affine import warp_affine_pallas
    from vacv_tpu.utils.perf import device_time
    from benchmarks.op_bench import _img

    src = _img(1440, 2560, seed=55)
    m5 = np.array([[0.9, 0.03, 40.0], [-0.03, 0.9, 25.0]], np.float32)
    minv = invert_affine(m5)
    pre5 = Preprocessor(PreprocessConfig(
        crop_rect=VRect(64, 36, 2496, 1404),
        warp=(tuple(map(tuple, m5)), (1216, 684)),
        out_size=(224, 224), out_layout=Layout.CHW, normalize=True))

    srcj = jax.device_put(jnp.asarray(src))
    batch2 = jnp.stack([srcj, srcj])
    cropped = srcj[36:1404, 64:2496]            # (1368, 2432, 3) u8
    planes = jnp.transpose(cropped, (2, 0, 1))  # (3, 1368, 2432) u8
    warped = warp_affine_pallas(planes, minv, 684, 1216, u8=True,
                                border_value=0.0)
    warped.block_until_ready()
    warped_b2 = jnp.stack([warped, warped])

    def jit1(x):
        return x + (jnp.uint8(1) - jnp.uint8(1))

    rows = []

    def t(name, fn, *args, iters=64):
        dt = device_time(fn, *args, iters=iters) * 1e3
        rows.append((name, dt))
        print(f"{name:45s} {dt:8.3f} ms")

    # full current pipeline, vmapped batch-2 (what config 5 measures
    # minus shard_map)
    vfn = jax.vmap(pre5.fn)
    t("full chain vmap b2 (current)", lambda i, b: vfn(b + (i % 2).astype(jnp.uint8)), batch2, iters=16)

    # per-frame, plain call
    t("full chain single frame", lambda i, b: pre5.fn(b + (i % 2).astype(jnp.uint8)), srcj, iters=16)

    # unrolled 2 independent frames
    def unroll2(i, b):
        o0 = pre5.fn(b[0] + (i % 2).astype(jnp.uint8))
        o1 = pre5.fn(b[1] + (i % 2).astype(jnp.uint8))
        return o0 + o1
    t("full chain unroll-2", unroll2, batch2, iters=16)

    # warp kernel alone on cropped planes (plain call -> streaming ok)
    def warp1(i, p):
        return warp_affine_pallas(
            p + (i % 2).astype(jnp.uint8), minv, 684, 1216, u8=True,
            border_value=0.0)
    t("warp kernel alone (plain, 2432x1368)", warp1, planes, iters=32)

    # warp kernel under vmap b2
    vwarp = jax.vmap(lambda p: warp_affine_pallas(
        p, minv, 684, 1216, u8=True, border_value=0.0))
    t("warp kernel vmap b2", lambda i, b: vwarp(b + (i % 2).astype(jnp.uint8)), jnp.stack([planes, planes]), iters=16)

    # post-warp tail: resize planes 1216x684 -> 224 + trunc + normalize
    def tail(i, wb):
        w = wb + (i % 2).astype(jnp.uint8)
        f = resize_planes(w.astype(jnp.float32), 224, 224,
                          InterMode.INTER_LINEAR, u8=True)
        f = jnp.clip(jnp.floor(f + 1e-4), 0, 255)
        mu = f.mean(axis=(-2, -1), keepdims=True)
        sd = jnp.sqrt(jnp.square(f - mu).mean(axis=(-2, -1), keepdims=True))
        return (f - mu) / (sd + 1e-6)
    t("planar tail single (resize+norm)", tail, warped, iters=64)
    t("planar tail vmap b2", lambda i, b: jax.vmap(lambda w: tail(i, w))(b), warped_b2, iters=64)

    # HWC detour cost: transpose out+in at 1216x684
    def detour(i, wb):
        w = wb + (i % 2).astype(jnp.uint8)
        hwc = jnp.transpose(w, (1, 2, 0))
        return jnp.transpose(hwc, (2, 0, 1)) + jnp.uint8(1)
    t("CHW->HWC->CHW detour 1216x684 u8", detour, warped, iters=64)

    # crop+transpose head at 2560x1440
    def head(i, s):
        c = (s + (i % 2).astype(jnp.uint8))[36:1404, 64:2496]
        return jnp.transpose(c, (2, 0, 1))
    t("crop+transpose head 2560x1440", head, srcj, iters=64)

    print()
    for name, dt in rows:
        print(f"{name}\t{dt:.3f}")


if __name__ == "__main__":
    main()
