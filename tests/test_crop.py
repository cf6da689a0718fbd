"""crop differential tests (model: reference test_crop.cpp:44-133 —
sizes from 5x5 SIMD-remainder up to large, HWC/CHW, u8/f32)."""
import numpy as np
import pytest

import vacv_tpu as vc


RECTS = [
    (0, 0, 5, 5),
    (3, 2, 35, 19),
    (10, 20, 170, 130),
    (100, 50, 500, 300),
]


@pytest.mark.parametrize("left,top,w,h", RECTS)
@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_crop_hwc(bgr_640x360, left, top, w, h, dtype):
    src = bgr_640x360.astype(dtype)
    rect = vc.VRect(left, top, left + w, top + h)
    out = vc.crop(src, rect)
    ref = src[top : top + h, left : left + w]
    np.testing.assert_array_equal(out.numpy(), ref)


@pytest.mark.parametrize("left,top,w,h", RECTS[:2])
def test_crop_chw(bgr_640x360, left, top, w, h):
    chw = np.transpose(bgr_640x360, (2, 0, 1))
    rect = vc.VRect(left, top, left + w, top + h)
    out = vc.crop(vc.Image(chw, vc.CHW), rect)
    ref = chw[:, top : top + h, left : left + w]
    np.testing.assert_array_equal(out.numpy(), ref)


def test_crop_float_rect_truncation(bgr_640x360):
    # VRect floats are C-truncated (crop.cpp:127-131).
    rect = vc.VRect(10.9, 20.7, 50.2, 60.9)
    out = vc.crop(bgr_640x360, rect)
    # left=10, top=20, w=int(50.2-10.9)=39, h=int(60.9-20.7)=40
    assert out.shape == (40, 39, 3)
    np.testing.assert_array_equal(out.numpy(), bgr_640x360[20:60, 10:49])


def test_crop_gray(bgr_640x360):
    gray = bgr_640x360[..., 0]
    out = vc.crop(gray, vc.VRect(5, 6, 25, 30))
    np.testing.assert_array_equal(out.numpy(), gray[6:30, 5:25])


def test_crop_dynamic(bgr_640x360):
    import jax

    fn = jax.jit(
        lambda x, l, t: vc.crop_dynamic(vc.as_image(x), l, t, 64, 32).data
    )
    out = fn(bgr_640x360, 11, 7)
    np.testing.assert_array_equal(np.asarray(out), bgr_640x360[7:39, 11:75])
