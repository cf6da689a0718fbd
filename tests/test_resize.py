"""resize differential tests vs OpenCV + the fixed-point spec oracle
(model: reference test_resize.cpp — bilinear {hwc,chw}x{u8,f32}, cubic;
SURVEY §4 says to fix the reference harness quirk of passing the interp
enum in the fx slot, so cubic here really exercises cubic)."""
import cv2
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.utils.compare import cosine_similarity

from oracle import resize_bilinear_u8

SIZES = [((360, 640), (180, 320)), ((144, 176), (288, 352)),
         ((360, 640), (224, 224)), ((48, 64), (33, 17))]


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bilinear_f32_matches_opencv(bgr_640x360, in_hw, out_hw):
    h, w = in_hw
    src = cv2.resize(bgr_640x360, (w, h)).astype(np.float32)
    oh, ow = out_hw
    ref = cv2.resize(src, (ow, oh), interpolation=cv2.INTER_LINEAR)
    out = vc.resize(src, (ow, oh), interpolation=vc.INTER_LINEAR).numpy()
    # float path is the same arithmetic as OpenCV's float bilinear
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-2)
    assert abs(cosine_similarity(out, ref) - 1) < 1e-6


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bilinear_u8_vs_spec_oracle(bgr_640x360, in_hw, out_hw):
    h, w = in_hw
    src = cv2.resize(bgr_640x360, (w, h))
    oh, ow = out_hw
    ref = resize_bilinear_u8(src, ow, oh)
    out = vc.resize(src, (ow, oh)).numpy()
    # fixed-point parity: at most occasional off-by-one from f32
    # accumulation at truncation boundaries
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
    assert abs(cosine_similarity(out, ref) - 1) < 1e-6


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bilinear_u8_vs_opencv_cosine(bgr_640x360, in_hw, out_hw):
    h, w = in_hw
    src = cv2.resize(bgr_640x360, (w, h))
    oh, ow = out_hw
    ref = cv2.resize(src, (ow, oh), interpolation=cv2.INTER_LINEAR)
    out = vc.resize(src, (ow, oh)).numpy()
    # OpenCV rounds where vacv truncates: ±1 LSB systematic — the
    # BASELINE bar is cosine ≥ 1 - 1e-4
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_cubic_f32_matches_opencv(bgr_640x360, in_hw, out_hw):
    h, w = in_hw
    src = cv2.resize(bgr_640x360, (w, h)).astype(np.float32)
    oh, ow = out_hw
    ref = cv2.resize(src, (ow, oh), interpolation=cv2.INTER_CUBIC)
    out = vc.resize(src, (ow, oh), interpolation=vc.INTER_CUBIC).numpy()
    assert abs(cosine_similarity(out, ref) - 1) < 1e-6
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=0.5)


def test_cubic_chw_matches_hwc(bgr_640x360):
    src = bgr_640x360.astype(np.float32)
    hwc = vc.resize(src, (320, 180), interpolation=vc.INTER_CUBIC).numpy()
    chw = vc.resize(
        vc.Image(np.transpose(src, (2, 0, 1)), vc.CHW), (320, 180),
        interpolation=vc.INTER_CUBIC,
    ).numpy()
    np.testing.assert_allclose(np.transpose(chw, (1, 2, 0)), hwc, atol=1e-3)


def test_nearest_matches_opencv(bgr_640x360):
    ref = cv2.resize(bgr_640x360, (320, 180), interpolation=cv2.INTER_NEAREST)
    out = vc.resize(bgr_640x360, (320, 180), interpolation=vc.INTER_NEAREST).numpy()
    np.testing.assert_array_equal(out, ref)


def test_area_downscale_matches_opencv(bgr_640x360):
    src = bgr_640x360.astype(np.float32)
    ref = cv2.resize(src, (160, 90), interpolation=cv2.INTER_AREA)
    out = vc.resize(src, (160, 90), interpolation=vc.INTER_AREA).numpy()
    assert abs(cosine_similarity(out, ref) - 1) < 1e-6
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=0.05)


def test_same_size_is_identity(bgr_640x360):
    out = vc.resize(bgr_640x360, (640, 360)).numpy()
    np.testing.assert_array_equal(out, bgr_640x360)


def test_fx_fy_size_resolution(bgr_640x360):
    out = vc.resize(bgr_640x360, None, fx=0.5, fy=0.5)
    assert out.shape == (180, 320, 3)


def test_gray_resize(bgr_640x360):
    gray = bgr_640x360[..., 0].astype(np.float32)
    ref = cv2.resize(gray, (320, 180), interpolation=cv2.INTER_LINEAR)
    out = vc.resize(gray, (320, 180)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-2)
