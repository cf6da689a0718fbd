"""Per-op differential benchmark table — the rebuild of the reference's
``test_main`` registry + ``CvProfile`` runner
(``/root/reference/src/test/src/test_main.cpp:15-67``), reporting
[opencv_ms, vacv_tpu_ms, cosine, expected] per op/config across the
reference's size ladder.

Run:  python -m benchmarks.op_bench  (add sizes with --sizes)
"""
from __future__ import annotations

import argparse

import numpy as np

import vacv_tpu as vc
from vacv_tpu.profile import CvProfile, TestFuncInfo
from vacv_tpu.utils.compare import cosine_similarity
from vacv_tpu.utils.perf import time_fn
from vacv_tpu.utils.io import bgr2nv21_numpy

# The reference's size ladder (test assets 176x144 .. 2560x1440).
SIZES = [(144, 176), (360, 640), (720, 1280), (1080, 1920), (1440, 2560)]


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 128 + 70 * np.sin(xx / 37.0) + 50 * np.cos(yy / 23.0)
    img = base[..., None] + rng.normal(0, 8, size=(h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _timed_pair(cv_fn, our_fn, ref_out_fn=None, iters=10):
    """Build a TestFunc: returns [cv_ms, ours_ms, cosine, 1.0]."""
    import time

    def run():
        t0 = time.perf_counter()
        ref = cv_fn()
        cv_ms = (time.perf_counter() - t0) * 1e3
        _, ours_ms, out = time_fn(our_fn, iters=3, warmup=1)
        ref_cmp = ref if ref_out_fn is None else ref_out_fn(ref)
        cos = cosine_similarity(np.asarray(out), ref_cmp)
        return [cv_ms, ours_ms, cos, 1.0]

    return run


def build_tests(sizes):
    import cv2

    cv2.setNumThreads(1)
    tests = []
    for h, w in sizes:
        src = _img(h, w)
        srcj = None

        import jax
        import jax.numpy as jnp

        srcj = jax.device_put(jnp.asarray(src))
        name_sz = f"{w}x{h}"

        # crop
        rect = (w // 8, h // 8, w // 8 + w // 2, h // 8 + h // 2)
        crop_fn = jax.jit(
            lambda x, r=rect: vc.crop(vc.as_image(x), vc.VRect(*r)).data
        )
        tests.append(TestFuncInfo(
            f"crop_{name_sz}",
            _timed_pair(
                lambda s=src, r=rect: s[r[1]:r[3], r[0]:r[2]].copy(),
                lambda s=srcj, f=crop_fn: f(s),
            ),
        ))

        # resize bilinear u8 -> 224
        rs_fn = jax.jit(lambda x: vc.resize(vc.as_image(x), (224, 224)).data)
        tests.append(TestFuncInfo(
            f"resize_linear_u8_{name_sz}",
            _timed_pair(
                lambda s=src: cv2.resize(s, (224, 224)),
                lambda s=srcj, f=rs_fn: f(s),
            ),
        ))

        # resize bicubic f32
        srcf = src.astype(np.float32)
        srcfj = jax.device_put(jnp.asarray(srcf))
        rc_fn = jax.jit(
            lambda x: vc.resize(vc.as_image(x), (224, 224),
                                interpolation=vc.INTER_CUBIC).data
        )
        tests.append(TestFuncInfo(
            f"resize_cubic_f32_{name_sz}",
            _timed_pair(
                lambda s=srcf: cv2.resize(s, (224, 224),
                                          interpolation=cv2.INTER_CUBIC),
                lambda s=srcfj, f=rc_fn: f(s),
            ),
        ))

        # yuv2bgr
        if h % 2 == 0 and w % 2 == 0:
            nv = bgr2nv21_numpy(src).reshape(h * 3 // 2, w)
            nvj = jax.device_put(jnp.asarray(nv))
            cc_fn = jax.jit(
                lambda x: vc.cvt_color(vc.as_image(x),
                                       vc.COLOR_YUV2BGR_NV21).data
            )
            tests.append(TestFuncInfo(
                f"yuv2bgr_{name_sz}",
                _timed_pair(
                    lambda n=nv, hh=h, ww=w: cv2.cvtColor(
                        n.reshape(hh * 3 // 2, ww), cv2.COLOR_YUV2BGR_NV21
                    ),
                    lambda n=nvj, f=cc_fn: f(n),
                    # compare both against the original (chroma math
                    # coefficients differ slightly between ref and cv2)
                    ref_out_fn=lambda r: r,
                ),
            ))

        # normalize (self-stats)
        nm_fn = jax.jit(lambda x: vc.normalize(vc.as_image(x)).data)

        def cv_norm(s=srcf):
            m, sd = cv2.meanStdDev(s)
            return (s - m.ravel().astype(np.float32)) / (
                sd.ravel().astype(np.float32) + 1e-6
            )

        tests.append(TestFuncInfo(
            f"normalize_{name_sz}",
            _timed_pair(cv_norm, lambda s=srcfj, f=nm_fn: f(s)),
        ))

        # warp_affine
        m = np.array([[0.85, 0.05, w * 0.05], [-0.05, 0.85, h * 0.05]],
                     np.float32)
        wa_fn = jax.jit(
            lambda x: vc.warp_affine(vc.as_image(x), m, (w // 2, h // 2)).data
        )
        tests.append(TestFuncInfo(
            f"warp_affine_{name_sz}",
            _timed_pair(
                lambda s=src: cv2.warpAffine(s, m.astype(np.float64),
                                             (w // 2, h // 2)),
                lambda s=srcj, f=wa_fn: f(s),
            ),
        ))
    return tests


def run_op_table(sizes=None):
    tests = build_tests(sizes or SIZES)
    prof = CvProfile(k_test_times=3, k_log_batch_size=10)
    prof.profile(tests, verbose=False)
    ok = prof.print_results()
    prof.save_results("bench_ops.json")
    return ok


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    run_op_table(SIZES[:2] if args.small else None)
