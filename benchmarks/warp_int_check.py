"""Device check for the round-5 integer warp path: parity vs the jnp
route + ladder-row timing (1080p u8, op_bench matrix, 960x540 out).

Run on the real TPU:  python -m benchmarks.warp_int_check
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import vacv_tpu as vc
from vacv_tpu import config
from vacv_tpu.core.types import InterMode, Layout
from vacv_tpu.utils.perf import device_time


def main():
    rng = np.random.default_rng(5)
    h, w = 1080, 1920
    src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    m = np.array([[0.85, 0.05, w * 0.02], [-0.05, 0.85, h * 0.02]],
                 np.float32)
    srcj = jax.device_put(jnp.asarray(src))

    for name, flags in [("linear", InterMode.INTER_LINEAR),
                        ("nearest", InterMode.INTER_NEAREST),
                        ("cubic", InterMode.INTER_CUBIC)]:
        with config.backend("pallas"):
            out_k = np.asarray(vc.warp_affine(
                vc.Image(srcj, Layout.HWC), m, (w // 2, h // 2),
                flags=flags).data)
        with config.backend("jnp"):
            ref = np.asarray(vc.warp_affine(
                vc.Image(srcj, Layout.HWC), m, (w // 2, h // 2),
                flags=flags).data)
        diff = np.abs(out_k.astype(int) - ref.astype(int))
        print(f"{name}: max_diff={diff.max()} "
              f"rate={(diff > 0).mean():.5f}")

        def step(i, b, mm=m, ff=flags):
            win = lax.dynamic_slice(b, (8 * (i % 2), 0, 0),
                                    (h - 8, w, 3))
            return vc.warp_affine(
                vc.Image(win, Layout.HWC), mm, (w // 2, h // 2),
                flags=ff).data

        sec = device_time(step, srcj)
        print(f"{name}: {sec*1e3:.3f} ms")

    # border-value variants (integer and fractional bv)
    for bv in (17.0, 17.5):
        with config.backend("pallas"):
            out_k = np.asarray(vc.warp_affine(
                vc.Image(srcj, Layout.HWC), m, (w // 2, h // 2),
                border_value=bv).data)
        with config.backend("jnp"):
            ref = np.asarray(vc.warp_affine(
                vc.Image(srcj, Layout.HWC), m, (w // 2, h // 2),
                border_value=bv).data)
        diff = np.abs(out_k.astype(int) - ref.astype(int))
        print(f"bv={bv}: max_diff={diff.max()} "
              f"rate={(diff > 0).mean():.5f}")


if __name__ == "__main__":
    main()
