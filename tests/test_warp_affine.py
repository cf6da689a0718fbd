"""warp_affine tests vs the bit-level spec oracle and OpenCV
(model: reference test_warp_affine.cpp — its fixed 2x3 matrix and the
scale/rot + aux-param recentring form)."""
import cv2
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.utils.compare import cosine_similarity

from oracle import warp_affine_u8

# The matrix the reference tests use (test_warp_affine.cpp:25-30).
REF_M = np.array(
    [[0.849158, 0.012257, -474.827], [-0.01225, 0.849158, -379.18]],
    dtype=np.float32,
)


def test_u8_bit_parity_with_spec_oracle(bgr_640x360):
    # Same linear part as the reference matrix, translation scaled to
    # the 640x360 test image so the ROI lands inside the source.
    m = REF_M.copy()
    m[0, 2], m[1, 2] = -60.0, -40.0
    out = vc.warp_affine(bgr_640x360, m, (240, 240), edge_mode="vacv").numpy()
    m_inv = vc.invert_affine(m)
    ref = warp_affine_u8(bgr_640x360, m_inv, 240, 240)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_vs_opencv(bgr_640x360, dtype):
    m = np.array([[0.7, 0.1, 20.0], [-0.1, 0.7, 30.0]], np.float32)
    src = bgr_640x360.astype(dtype)
    ref = cv2.warpAffine(
        src, m.astype(np.float64), (256, 200), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
    )
    out = vc.warp_affine(src, m, (256, 200)).numpy()
    # edge semantics differ (reference skips the last valid row/col);
    # cosine bar per BASELINE
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4


def test_chw_matches_hwc(bgr_640x360):
    m = np.array([[0.8, 0.05, 10.0], [-0.05, 0.8, 5.0]], np.float32)
    hwc = vc.warp_affine(bgr_640x360, m, (128, 96)).numpy()
    chw = vc.warp_affine(
        vc.Image(np.transpose(bgr_640x360, (2, 0, 1)), vc.CHW), m, (128, 96)
    ).numpy()
    np.testing.assert_array_equal(np.transpose(chw, (1, 2, 0)), hwc)


def test_rotation_matrix_matches_opencv():
    ours = vc.get_rotation_matrix_2d(vc.VPoint(10, 20), 33.0, 1.2)
    ref = cv2.getRotationMatrix2D((10.0, 20.0), 33.0, 1.2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_rot_form_with_aux_param(bgr_640x360):
    # Scale/rot + aux recentring (reference test_warp_affine.cpp:195-335
    # uses scale=1.073914, rot=-3.314525 with aux recentring).
    scale, rot = 1.073914, -3.314525
    aux = vc.VScalar(v0=300.0, v1=180.0, v2=70.0, v3=105.0)
    out = vc.warp_affine_rot(bgr_640x360, scale, rot, (140, 210), aux).numpy()

    rot_mat = cv2.getRotationMatrix2D((0.0, 0.0), rot, scale)
    rot_mat[0, 2] = aux.v2 - rot_mat[0, 0] * aux.v0 - rot_mat[0, 1] * aux.v1
    rot_mat[1, 2] = aux.v3 - rot_mat[1, 0] * aux.v0 - rot_mat[1, 1] * aux.v1
    ref = cv2.warpAffine(bgr_640x360, rot_mat, (140, 210))
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4


def test_inverse_map_flag(bgr_640x360):
    m = np.array([[0.7, 0.1, 20.0], [-0.1, 0.7, 30.0]], np.float32)
    m_inv = vc.invert_affine(m)
    a = vc.warp_affine(bgr_640x360, m, (100, 80)).numpy()
    b = vc.warp_affine(
        bgr_640x360, m_inv, (100, 80),
        flags=int(vc.INTER_LINEAR) | int(vc.InterMode.WARP_INVERSE_MAP),
    ).numpy()
    # same warp up to f32 matrix-inversion rounding
    assert abs(cosine_similarity(a, b) - 1) < 1e-5


def test_f32_matches_opencv_tight(bgr_640x360):
    src = bgr_640x360.astype(np.float32)
    m = np.array([[0.9, 0.0, 5.0], [0.0, 0.9, 8.0]], np.float32)
    ref = cv2.warpAffine(src, m.astype(np.float64), (300, 250))
    out = vc.warp_affine(src, m, (300, 250)).numpy()
    interior = np.abs(out - ref)[5:-5, 5:-5]
    assert interior.max() < 0.05


def test_border_replicate_vs_opencv(bgr_640x360):
    # The reference falls back to OpenCV for BORDER_REPLICATE
    # (warp_affine.cpp:114-119); we support it natively.
    m = np.array([[0.7, 0.1, -40.0], [-0.1, 0.7, -30.0]], np.float32)
    src = bgr_640x360.astype(np.float32)
    ref = cv2.warpAffine(
        src, m.astype(np.float64), (256, 200), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REPLICATE,
    )
    out = vc.warp_affine(
        src, m, (256, 200), border_mode=vc.BORDER_REPLICATE
    ).numpy()
    assert abs(cosine_similarity(out, ref) - 1) < 1e-5


def test_border_value_nonzero(bgr_640x360):
    m = np.array([[1.0, 0.0, -600.0], [0.0, 1.0, -340.0]], np.float32)
    out = vc.warp_affine(bgr_640x360, m, (100, 80), border_value=17.0).numpy()
    # entire output is out of source bounds -> all border value
    ref = cv2.warpAffine(
        bgr_640x360, m.astype(np.float64), (100, 80),
        borderValue=(17.0, 17.0, 17.0),
    )
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_nearest_vs_opencv(bgr_640x360, dtype):
    # Reference served INTER_NEAREST through its OpenCV fallback
    # (warp_affine.cpp:114-119); we implement it natively.
    m = np.array([[0.7, 0.1, 20.0], [-0.1, 0.7, 30.0]], np.float32)
    src = bgr_640x360.astype(dtype)
    ref = cv2.warpAffine(
        src, m.astype(np.float64), (256, 200), flags=cv2.INTER_NEAREST,
        borderMode=cv2.BORDER_CONSTANT,
    )
    out = vc.warp_affine(src, m, (256, 200), flags=vc.INTER_NEAREST).numpy()
    # coordinate rounding sits on half-integer knife edges for a few
    # pixels; everything else must agree exactly
    assert (out != ref).mean() < 5e-3
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_cubic_vs_opencv(bgr_640x360, dtype):
    m = np.array([[0.7, 0.1, 20.0], [-0.1, 0.7, 30.0]], np.float32)
    src = bgr_640x360.astype(dtype)
    ref = cv2.warpAffine(
        src, m.astype(np.float64), (256, 200), flags=cv2.INTER_CUBIC,
        borderMode=cv2.BORDER_CONSTANT,
    )
    out = vc.warp_affine(src, m, (256, 200), flags=vc.INTER_CUBIC).numpy()
    # OpenCV quantizes fractional offsets to 1/32 (INTER_BITS=5); we use
    # exact float offsets — cosine bar, not bit parity.
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4


def test_cubic_replicate_vs_opencv(bgr_640x360):
    m = np.array([[0.9, 0.2, -40.0], [-0.2, 0.9, 10.0]], np.float32)
    ref = cv2.warpAffine(
        bgr_640x360, m.astype(np.float64), (320, 240), flags=cv2.INTER_CUBIC,
        borderMode=cv2.BORDER_REPLICATE,
    )
    out = vc.warp_affine(
        bgr_640x360, m, (320, 240), flags=vc.INTER_CUBIC,
        border_mode=vc.BORDER_REPLICATE,
    ).numpy()
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4


@pytest.mark.parametrize("mode", ["BORDER_REFLECT", "BORDER_REFLECT_101",
                                  "BORDER_WRAP"])
@pytest.mark.parametrize("size", [(176, 144), (640, 360)])
def test_border_remap_modes_vs_opencv(rng, mode, size):
    """REFLECT/REFLECT_101/WRAP as native coordinate remaps (the
    reference served these via its OpenCV fallback,
    warp_affine.cpp:114-119; enum cv.h:39-49)."""
    from conftest import make_bgr

    w, h = size
    src = make_bgr(h, w, rng).astype(np.float32)
    # Shift well past the edges so every border path is exercised.
    m = np.array([[0.7, 0.1, -60.0], [-0.1, 0.7, -40.0]], np.float32)
    ref = cv2.warpAffine(
        src, m.astype(np.float64), (w // 2 + 32, h // 2 + 16),
        flags=cv2.INTER_LINEAR, borderMode=getattr(cv2, mode),
    )
    out = vc.warp_affine(
        src, m, (w // 2 + 32, h // 2 + 16),
        border_mode=getattr(vc.BorderMode, mode),
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_border_reflect_u8_vs_opencv(bgr_640x360):
    m = np.array([[0.8, 0.05, -30.0], [-0.05, 0.8, -20.0]], np.float32)
    ref = cv2.warpAffine(
        bgr_640x360, m.astype(np.float64), (300, 220),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101,
    )
    out = vc.warp_affine(
        bgr_640x360, m, (300, 220),
        border_mode=vc.BorderMode.BORDER_REFLECT_101,
    ).numpy()
    # u8: vacv Q11/Q22-truncation parity vs cv2's round -> <=1 LSB.
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_border_transparent_matches_vacv_skip(bgr_640x360):
    """BORDER_TRANSPARENT == the reference's skip-and-leave-zero
    semantics on a fresh dst (warp_affine_naive.cpp:26-38)."""
    m = np.array([[0.7, 0.1, -60.0], [-0.1, 0.7, -40.0]], np.float32)
    out_t = vc.warp_affine(
        bgr_640x360, m, (256, 200),
        border_mode=vc.BorderMode.BORDER_TRANSPARENT,
    ).numpy()
    out_v = vc.warp_affine(
        bgr_640x360, m, (256, 200), edge_mode="vacv"
    ).numpy()
    np.testing.assert_array_equal(out_t, out_v)


# ---- separable (axis-aligned) fast path --------------------------------

def test_separable_routing(bgr_640x360):
    """m1 == m3 == 0 routes to the banded-matmul separable path; a
    rotated matrix does not."""
    from vacv_tpu import config

    m_axis = np.array([[0.9, 0.0, 5.0], [0.0, 1.1, -8.0]], np.float32)
    m_rot = np.array([[0.9, 0.01, 5.0], [-0.01, 0.9, -8.0]], np.float32)
    c0 = config.kernel_count("warp_separable")
    vc.warp_affine(bgr_640x360, m_axis, (256, 200)).numpy()
    assert config.kernel_count("warp_separable") == c0 + 1
    vc.warp_affine(bgr_640x360, m_rot, (256, 200)).numpy()
    assert config.kernel_count("warp_separable") == c0 + 1


def test_separable_matches_gather_route(bgr_640x360):
    """The separable matmul path reproduces the jnp gather route
    (u8: <=1 LSB from f32 association; f32: tight abs)."""
    import jax.numpy as jnp

    from vacv_tpu.ops.warp_affine import _warp_planes

    m = np.array([[0.9, 0.0, 5.0], [0.0, 1.1, -8.0]], np.float32)
    minv = vc.invert_affine(m)
    out = vc.warp_affine(bgr_640x360, m, (256, 200)).numpy()
    pl = jnp.transpose(jnp.asarray(bgr_640x360), (2, 0, 1)).astype(jnp.float32)
    g = _warp_planes(pl, minv, 200, 256, u8=True, border_value=0.0,
                     edge_mode="opencv")
    g = np.clip(np.floor(np.asarray(g) + 1e-4), 0, 255).astype(np.uint8)
    diff = np.abs(out.astype(int) - np.transpose(g, (1, 2, 0)).astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01

    srcf = bgr_640x360.astype(np.float32)
    outf = vc.warp_affine(srcf, m, (256, 200)).numpy()
    gf = np.transpose(np.asarray(
        _warp_planes(pl, minv, 200, 256, u8=False, border_value=0.0,
                     edge_mode="opencv")), (1, 2, 0))
    np.testing.assert_allclose(outf, gf, atol=0.02)


def test_separable_flip_vs_opencv(bgr_640x360):
    """Negative-scale (mirror) warps are axis-aligned too; integer
    flips must be exact."""
    m = np.array([[-1.0, 0.0, 639.0], [0.0, 1.0, 0.0]], np.float32)
    out = vc.warp_affine(bgr_640x360, m, (640, 360)).numpy()
    ref = cv2.warpAffine(bgr_640x360, m.astype(np.float64), (640, 360))
    np.testing.assert_array_equal(out, ref)


def test_separable_wrap_overshoot_vs_opencv(bgr_640x360):
    """WRAP border with overshoot far beyond the kernel route's pad
    cap: the separable path folds the border rule into the tap index,
    so arbitrary overshoot is exact."""
    srcf = bgr_640x360.astype(np.float32)
    m = np.array([[1.0, 0.0, -900.0], [0.0, 1.0, -500.0]], np.float32)
    out = vc.warp_affine(
        srcf, m, (400, 300), border_mode=vc.BorderMode.BORDER_WRAP
    ).numpy()
    ref = cv2.warpAffine(
        srcf, m.astype(np.float64), (400, 300),
        borderMode=cv2.BORDER_WRAP,
    )
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_separable_under_vmap(bgr_640x360):
    """The separable path is pure jnp — it must vmap (the selection
    kernel needs its vmap-specific resident plan instead)."""
    import jax
    import jax.numpy as jnp

    from vacv_tpu.core.types import Layout

    m = np.array([[0.9, 0.0, 5.0], [0.0, 0.9, 8.0]], np.float32)
    batch = jnp.stack([jnp.asarray(bgr_640x360)] * 2)

    def one(x):
        return vc.warp_affine(vc.Image(x, Layout.HWC), m, (128, 96)).data

    vout = np.asarray(jax.vmap(one)(batch))
    single = np.asarray(one(jnp.asarray(bgr_640x360)))
    np.testing.assert_array_equal(vout[0], single)
    np.testing.assert_array_equal(vout[1], single)
