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


# ---- tiled pallas normalize kernel (any frame size, both layouts)


@pytest.mark.parametrize("layout,shape", [
    ("chw", (3, 300, 640)),    # multi-chunk planes, odd chunk tail
    ("chw", (3, 64, 96)),      # single chunk
    ("hwc", (300, 640, 3)),    # interleaved lanes, multi-chunk
    ("hwc", (45, 33, 3)),      # odd lanes (99), odd rows
])
def test_pallas_normalize_tiled_matches_jnp(rng, layout, shape):
    import jax.numpy as jnp

    from vacv_tpu import config
    from vacv_tpu.core.image import Image
    from vacv_tpu.core.types import Layout
    from vacv_tpu.ops.normalize import normalize_jnp
    from vacv_tpu.ops.pallas.normalize import normalize_fused_pallas

    x = rng.integers(0, 256, size=shape, dtype=np.uint8)
    lay = Layout.HWC if layout == "hwc" else Layout.CHW
    img = Image(jnp.asarray(x), lay)
    with config.backend("pallas"):
        got = np.asarray(normalize_fused_pallas(img).data)
    want = np.asarray(normalize_jnp(img).data)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pallas_normalize_chunked_forces_multiple_chunks(rng):
    """Shrink the chunk budget so even a small frame multi-chunks, and
    check the Chan merge against a float64 oracle."""
    import jax.numpy as jnp

    from vacv_tpu import config
    from vacv_tpu.core.image import Image
    from vacv_tpu.core.types import Layout
    from vacv_tpu.ops.pallas import normalize as pn

    x = rng.integers(0, 256, size=(3, 200, 128), dtype=np.uint8)
    old = pn._CHUNK_BUDGET
    pn._CHUNK_BUDGET = 64 * 1024  # ~50 rows/chunk -> 4+ chunks
    try:
        with config.backend("pallas"):
            got = np.asarray(
                normalize_fused_pallas_fresh(Image(jnp.asarray(x), Layout.CHW))
            )
    finally:
        pn._CHUNK_BUDGET = old
    f = x.astype(np.float64)
    mu = f.mean(axis=(1, 2), keepdims=True)
    sd = f.std(axis=(1, 2), keepdims=True)
    want = (f - mu) / (sd + 1e-6)
    np.testing.assert_allclose(got, want, atol=1e-3)


def normalize_fused_pallas_fresh(img):
    """Call the kernel bypassing the jit cache (the chunk size is
    derived from module state the cached trace has already baked in)."""
    from vacv_tpu.ops.pallas import normalize as pn

    pn._call_chw._clear_cache()
    try:
        return pn.normalize_fused_pallas(img).data
    finally:
        pn._call_chw._clear_cache()


def test_pallas_normalize_under_vmap(rng):
    """The batched() pipeline vmaps the dispatcher; the pallas kernel
    must batch correctly (pallas adds a leading grid dim)."""
    import jax
    import jax.numpy as jnp

    from vacv_tpu import config
    from vacv_tpu.core.image import Image
    from vacv_tpu.core.types import Layout
    from vacv_tpu.ops.normalize import normalize, normalize_jnp

    x = rng.integers(0, 256, size=(4, 3, 64, 96), dtype=np.uint8)
    with config.backend("pallas"):
        f = jax.vmap(lambda a: normalize(Image(a, Layout.CHW)).data)
        got = np.asarray(f(jnp.asarray(x)))
    want = np.stack([
        np.asarray(normalize_jnp(Image(jnp.asarray(x[i]), Layout.CHW)).data)
        for i in range(4)
    ])
    np.testing.assert_allclose(got, want, atol=1e-4)
