"""Native C++ host-utility tests (build via make; bit-parity with the
numpy reference implementations)."""
import numpy as np
import pytest

from vacv_tpu import native
from vacv_tpu.utils.io import bgr2nv21_numpy, nv21_planes

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_bgr2nv21_bit_exact(bgr_176x144):
    ref = bgr2nv21_numpy(bgr_176x144)
    out = native.bgr2nv21(bgr_176x144)
    np.testing.assert_array_equal(out, ref)


def test_nv_to_bgr_bit_exact(bgr_176x144):
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracle import nv_to_bgr as oracle_nv

    nv = bgr2nv21_numpy(bgr_176x144)
    h, w, _ = bgr_176x144.shape
    y, vu = nv21_planes(nv, w, h)
    ref = oracle_nv(y, vu, is_nv12=False)
    out = native.nv_to_bgr(y, vu, is_nv12=False)
    np.testing.assert_array_equal(out, ref)
    # NV12 order too
    ref12 = oracle_nv(y, vu, is_nv12=True)
    out12 = native.nv_to_bgr(y, vu, is_nv12=True)
    np.testing.assert_array_equal(out12, ref12)


def test_cosine_matches_numpy(bgr_176x144, rng):
    from vacv_tpu.utils.compare import cosine_similarity

    a = bgr_176x144
    b = np.clip(
        a.astype(np.int16) + rng.integers(-3, 4, a.shape), 0, 255
    ).astype(np.uint8)
    assert abs(native.cosine(a, b) - cosine_similarity(a, b)) < 1e-9

    af = a.astype(np.float32)
    bf = b.astype(np.float32)
    assert abs(native.cosine(af, bf) - cosine_similarity(af, bf)) < 1e-9
