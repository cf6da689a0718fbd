"""Additional resize coverage: INTER_AREA u8, upscale paths, extreme
aspect changes, vmap batching."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.utils.compare import cosine_similarity


def test_area_u8_downscale(bgr_640x360):
    ref = cv2.resize(bgr_640x360, (80, 45), interpolation=cv2.INTER_AREA)
    out = vc.resize(bgr_640x360, (80, 45), interpolation=vc.INTER_AREA).numpy()
    # u8 rounding differences only
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4


def test_area_integer_ratio_exact(bgr_640x360):
    # 2x2 box downscale of f32 is exact averaging
    src = bgr_640x360.astype(np.float32)
    ref = cv2.resize(src, (320, 180), interpolation=cv2.INTER_AREA)
    out = vc.resize(src, (320, 180), interpolation=vc.INTER_AREA).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_upscale_linear(bgr_176x144):
    src = bgr_176x144.astype(np.float32)
    ref = cv2.resize(src, (704, 576), interpolation=cv2.INTER_LINEAR)
    out = vc.resize(src, (704, 576)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-2)


def test_extreme_aspect(bgr_640x360):
    src = bgr_640x360.astype(np.float32)
    ref = cv2.resize(src, (1024, 8), interpolation=cv2.INTER_LINEAR)
    out = vc.resize(src, (1024, 8)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-2)


def test_vmap_batch_resize(bgr_176x144, rng):
    batch = np.stack([
        bgr_176x144,
        rng.integers(0, 256, bgr_176x144.shape, dtype=np.uint8),
    ]).astype(np.float32)
    fn = jax.vmap(lambda x: vc.resize(vc.as_image(x), (64, 64)).data)
    out = np.asarray(fn(jnp.asarray(batch)))
    for i in range(2):
        single = vc.resize(batch[i], (64, 64)).numpy()
        np.testing.assert_allclose(out[i], single, atol=1e-4)


def test_one_pixel_output(bgr_176x144):
    out = vc.resize(bgr_176x144.astype(np.float32), (1, 1),
                    interpolation=vc.INTER_AREA).numpy()
    ref = bgr_176x144.reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(out[0, 0], ref, rtol=1e-3)


def test_weight_matrix_rows_sum_to_one():
    from vacv_tpu.ops.resize import _cubic_weights, _linear_weights, _area_weights

    for n_in, n_out in [(144, 37), (37, 144), (1036, 224), (5, 9)]:
        for W in (_linear_weights(n_in, n_out, False),
                  _linear_weights(n_in, n_out, True),
                  _cubic_weights(n_in, n_out),
                  _area_weights(n_in, n_out)):
            np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=2e-3)


def test_cubic_u8_rounds_like_opencv(bgr_176x144):
    ref = cv2.resize(bgr_176x144, (88, 72), interpolation=cv2.INTER_CUBIC)
    out = vc.resize(bgr_176x144, (88, 72), interpolation=vc.INTER_CUBIC).numpy()
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert (diff > 1).mean() < 0.001  # rounding parity, no floor bias
    assert abs(np.mean(out.astype(float) - ref.astype(float))) < 0.05


def test_area_u8_rounds_like_opencv(bgr_176x144):
    ref = cv2.resize(bgr_176x144, (88, 72), interpolation=cv2.INTER_AREA)
    out = vc.resize(bgr_176x144, (88, 72), interpolation=vc.INTER_AREA).numpy()
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert abs(np.mean(out.astype(float) - ref.astype(float))) < 0.05


def test_lanczos4_matches_opencv(bgr_640x360):
    src = bgr_640x360.astype(np.float32)
    ref = cv2.resize(src, (320, 180), interpolation=cv2.INTER_LANCZOS4)
    out = vc.resize(src, (320, 180),
                    interpolation=vc.InterMode.INTER_LANCZOS4).numpy()
    assert abs(cosine_similarity(out, ref) - 1) < 1e-5
    interior = np.abs(out - ref)[8:-8, 8:-8]
    assert interior.max() < 0.1


def test_lanczos4_upscale(bgr_176x144):
    src = bgr_176x144.astype(np.float32)
    ref = cv2.resize(src, (352, 288), interpolation=cv2.INTER_LANCZOS4)
    out = vc.resize(src, (352, 288),
                    interpolation=vc.InterMode.INTER_LANCZOS4).numpy()
    assert abs(cosine_similarity(out, ref) - 1) < 1e-5
