"""normalize / mean_stddev tests vs an fp64 numpy oracle and the cv2
meanStdDev chain (model: reference test_normalize.cpp:22-143)."""
import cv2
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.utils.compare import cosine_similarity


def _oracle(src_f32):
    m = src_f32.reshape(-1, src_f32.shape[-1]).mean(axis=0, dtype=np.float64)
    var = ((src_f32.astype(np.float64) - m) ** 2).reshape(-1, 3).mean(axis=0)
    s = np.sqrt(var)
    return (src_f32 - m.astype(np.float32)) / (s.astype(np.float32) + 1e-6), m, s


def test_mean_stddev_matches_cv2(bgr_176x144):
    src = bgr_176x144.astype(np.float32)
    m_ref, s_ref = cv2.meanStdDev(src)
    m, s = vc.mean_stddev(src)
    np.testing.assert_allclose(np.asarray(m), m_ref.ravel(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), s_ref.ravel(), rtol=1e-4)


@pytest.mark.parametrize("layout", [vc.HWC, vc.CHW])
def test_normalize_self_stats(bgr_176x144, layout):
    src = bgr_176x144.astype(np.float32)
    ref, _, _ = _oracle(src)
    data = src if layout == vc.HWC else np.transpose(src, (2, 0, 1))
    out = vc.normalize(vc.Image(data, layout)).numpy()
    if layout == vc.CHW:
        out = np.transpose(out, (1, 2, 0))
    assert abs(cosine_similarity(out, ref) - 1) < 1e-6
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_normalize_explicit_stats(bgr_176x144):
    src = bgr_176x144.astype(np.float32)
    mean = np.array([100.0, 110.0, 120.0], np.float32)
    std = np.array([50.0, 55.0, 60.0], np.float32)
    out = vc.normalize(src, mean, std).numpy()
    ref = (src - mean) / (std + 1e-6)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_normalize_u8_autoconverts(bgr_176x144):
    out_u8 = vc.normalize(bgr_176x144).numpy()
    out_f32 = vc.normalize(bgr_176x144.astype(np.float32)).numpy()
    np.testing.assert_allclose(out_u8, out_f32, atol=1e-5)


def test_normalize_flat_image():
    # Flat image: std=0, output must be 0 (epsilon in denominator).
    flat = np.full((16, 16, 3), 77, np.float32)
    out = vc.normalize(flat).numpy()
    np.testing.assert_allclose(out, 0.0, atol=1e-4)


def test_pallas_fused_matches_jnp(bgr_176x144):
    from vacv_tpu.ops.normalize import normalize_jnp
    from vacv_tpu.ops.pallas.normalize import normalize_fused_pallas

    img = vc.as_image(bgr_176x144)
    ref = normalize_jnp(img).numpy()
    out = normalize_fused_pallas(img).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    assert abs(cosine_similarity(out, ref) - 1) < 1e-7


def test_normalize_partial_stats(bgr_176x144):
    # Supplying only mean must honor it and auto-compute stddev.
    src = bgr_176x144.astype(np.float32)
    mean = np.array([100.0, 110.0, 120.0], np.float32)
    out = vc.normalize(src, mean=mean).numpy()
    _, s = vc.mean_stddev(src)
    ref = (src - mean) / (np.asarray(s) + 1e-6)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
