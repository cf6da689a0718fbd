"""match_template + min_max_idx vs OpenCV for all six TM_* modes."""
import cv2
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.utils.compare import cosine_similarity

MODES = [
    (vc.TM_SQDIFF, cv2.TM_SQDIFF),
    (vc.TM_SQDIFF_NORMED, cv2.TM_SQDIFF_NORMED),
    (vc.TM_CCORR, cv2.TM_CCORR),
    (vc.TM_CCORR_NORMED, cv2.TM_CCORR_NORMED),
    (vc.TM_CCOEFF, cv2.TM_CCOEFF),
    (vc.TM_CCOEFF_NORMED, cv2.TM_CCOEFF_NORMED),
]


@pytest.mark.parametrize("ours,theirs", MODES)
@pytest.mark.parametrize("channels", [1, 3])
def test_modes_vs_opencv(bgr_176x144, ours, theirs, channels):
    src = bgr_176x144.astype(np.float32)
    if channels == 1:
        src = src[..., 0]
    templ = src[40:70, 50:90] if channels == 1 else src[40:70, 50:90, :]
    ref = cv2.matchTemplate(src, templ, theirs)
    out = vc.match_template(src, templ, ours).numpy()
    assert out.shape == ref.shape
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-3)


def test_peak_location_matches(bgr_176x144):
    src = bgr_176x144.astype(np.float32)
    templ = src[30:62, 20:52]
    out = vc.match_template(src, templ, vc.TM_CCOEFF_NORMED)
    _, max_val, _, max_idx = vc.min_max_idx(out)
    h_r, w_r = out.shape[:2]
    my, mx = divmod(int(max_idx), w_r)
    assert (my, mx) == (30, 20)
    assert float(max_val) > 0.99


def test_min_max_idx_basic():
    x = np.array([[3.0, 1.0], [7.0, -2.0]], np.float32)
    mn, mx, mi, ma = vc.min_max_idx(x)
    assert float(mn) == -2.0 and float(mx) == 7.0
    assert int(mi) == 3 and int(ma) == 2


def test_min_max_idx_mask():
    x = np.array([[3.0, 1.0], [7.0, -2.0]], np.float32)
    mask = np.array([[1, 1], [0, 0]], np.uint8)
    mn, mx, mi, ma = vc.min_max_idx(x, mask)
    assert float(mn) == 1.0 and float(mx) == 3.0


def test_min_max_loc(bgr_176x144):
    src = bgr_176x144.astype(np.float32)
    templ = src[30:62, 20:52]
    out = vc.match_template(src, templ, vc.TM_CCOEFF_NORMED)
    _, mx, _, max_pt = vc.min_max_loc(out)
    assert tuple(int(v) for v in max_pt) == (20, 30)
    ref_min, ref_max, ref_minl, ref_maxl = cv2.minMaxLoc(np.asarray(out.data))
    assert tuple(int(v) for v in max_pt) == tuple(ref_maxl)


def test_min_max_idx_all_masked():
    x = np.array([[3.0, 1.0], [7.0, -2.0]], np.float32)
    mn, mx, _, _ = vc.min_max_idx(x, np.zeros_like(x, dtype=np.uint8))
    assert np.isnan(float(mn)) and np.isnan(float(mx))


def test_corr_kernel_routes_and_matches_fallback(rng):
    """Round-4 kernel: the resident-image correlation must route under
    the pallas backend and agree with the XLA unfold fallback."""
    import jax.numpy as jnp

    from vacv_tpu import config
    from vacv_tpu.ops.match_template import _corr

    x = jnp.asarray(rng.integers(0, 256, (1, 3, 96, 256)).astype(np.float32))
    k = jnp.asarray(rng.integers(0, 256, (1, 3, 24, 17)).astype(np.float32))
    with config.backend("jnp"):
        ref = np.asarray(_corr(x, k))
    before = config.kernel_count("match_corr")
    with config.backend("pallas"):
        got = np.asarray(_corr(x, k, True))
    assert config.kernel_count("match_corr") > before
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-2)


def test_corr_kernel_fractional_f32(rng):
    """Fractional (non-u8-derived) f32 images take the hi/lo image
    split; error must stay far below the 1e-4 cosine bar."""
    import jax.numpy as jnp

    from vacv_tpu import config
    from vacv_tpu.ops.match_template import _corr

    x = jnp.asarray(rng.random((1, 1, 64, 128), dtype=np.float32) * 2 - 1)
    k = jnp.asarray(rng.random((1, 1, 16, 16), dtype=np.float32) * 2 - 1)
    with config.backend("jnp"):
        ref = np.asarray(_corr(x, k))
    with config.backend("pallas"):
        got = np.asarray(_corr(x, k, False))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 1e-5 * scale


def test_corr_supported_gates():
    from vacv_tpu.ops.pallas.match_template import corr_supported

    assert corr_supported(3, 360, 640, 32, 32)
    assert corr_supported(1, 1080, 1920, 64, 64)
    assert not corr_supported(3, 360, 640, 32, 200)   # tw > 128
    assert not corr_supported(3, 16, 640, 32, 16)     # th > h
    assert not corr_supported(3, 2200, 4000, 32, 32)  # over VMEM budget
