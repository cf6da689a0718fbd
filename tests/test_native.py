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


def test_jpeg_decode_matches_cv2(bgr_176x144):
    import cv2

    if not native.has_jpeg():
        pytest.skip("libjpeg not available")
    ok, enc = cv2.imencode(".jpg", bgr_176x144, [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    dec = native.decode_jpeg(enc.tobytes())
    ref = cv2.imdecode(enc, 1)
    np.testing.assert_array_equal(dec, ref)
    with pytest.raises(ValueError):
        native.decode_jpeg(b"not a jpeg")


def test_batch_loader(tmp_path, bgr_176x144):
    import cv2

    from vacv_tpu.utils.loader import BatchLoader

    paths = []
    for i in range(5):
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, bgr_176x144)
        paths.append(p)
    batches = list(BatchLoader(paths, 2, drop_remainder=True))
    assert len(batches) == 2 and batches[0].shape == (2, 144, 176, 3)
    all_b = list(BatchLoader(paths, 2, drop_remainder=False))
    assert len(all_b) == 3 and all_b[-1].shape[0] == 1
    np.testing.assert_array_equal(batches[0][0], bgr_176x144)
