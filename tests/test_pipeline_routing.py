"""Pipeline → kernel routing: with the pallas backend forced, the
Preprocessor must serve supported configs from the fused Pallas
preprocess kernel (and the normalize dispatcher must reach the fused
normalize kernel) without the caller opting in.  Counters in
``vacv_tpu.config`` record which backend served each op at trace time.
"""
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu import config
from vacv_tpu.models import PreprocessConfig, Preprocessor

H, W = 256, 384  # W*3 = 1152 lanes — fused-plan eligible
CFG = PreprocessConfig(
    crop_rect=vc.VRect(16, 8, 16 + 352, 8 + 240),
    out_size=(112, 112),
    out_layout=vc.CHW,
    normalize=True,
)


def make(rng, n=0):
    shape = (H, W, 3) if n == 0 else (n, H, W, 3)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def test_single_image_routes_to_fused_kernel(rng):
    with config.backend("pallas"):
        pre = Preprocessor(CFG)
        before = config.kernel_count("preprocess_fused")
        out = np.asarray(pre(make(rng)))
        assert config.kernel_count("preprocess_fused") > before
    assert out.shape == (3, 112, 112)
    # parity vs the jnp chain
    with config.backend("jnp"):
        ref = np.asarray(Preprocessor(CFG)(make(np.random.default_rng(1234))))
    # same rng stream reproduction: rebuild input deterministically
    rng2 = np.random.default_rng(99)
    x = make(rng2)
    with config.backend("pallas"):
        got = np.asarray(Preprocessor(CFG)(x))
    with config.backend("jnp"):
        want = np.asarray(Preprocessor(CFG)(x))
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_batch_routes_to_fused_kernel(rng):
    x = make(rng, n=3)
    with config.backend("pallas"):
        pre = Preprocessor(CFG)
        before = config.kernel_count("preprocess_fused")
        out = np.asarray(pre.batch(x))
        assert config.kernel_count("preprocess_fused") > before
    with config.backend("jnp"):
        want = np.asarray(Preprocessor(CFG).batch(x))
    assert out.shape == want.shape == (3, 3, 112, 112)
    np.testing.assert_allclose(out, want, atol=5e-2)


def test_unsupported_shape_falls_back(rng):
    # 200x300 (900 lanes) now routes through the fused kernel via the
    # wrapper pad (round-3 gate lift); a 24-row frame (below the DMA
    # chunk floor) still falls back to the jnp chain.
    x = rng.integers(0, 256, size=(200, 300, 3), dtype=np.uint8)
    cfg = PreprocessConfig(out_size=(64, 64))
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        assert pre._fused_geometry(x.shape, x.dtype) is not None
        out = np.asarray(pre(x))
    assert out.shape == (3, 64, 64)
    tiny = rng.integers(0, 256, size=(24, 256, 3), dtype=np.uint8)
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        assert pre._fused_geometry(tiny.shape, tiny.dtype) is None
        out = np.asarray(pre(tiny))
    assert out.shape == (3, 64, 64)


def test_unsupported_mode_falls_back(rng):
    # Round 5 moved cubic/nearest INTO the fused plan; AREA (and
    # lanczos4) still take the vmapped chain.
    x = make(rng)
    cfg = PreprocessConfig(
        out_size=(64, 64), interpolation=vc.INTER_AREA
    )
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        assert pre._fused_geometry(x.shape, x.dtype) is None


@pytest.mark.parametrize("mode", [vc.INTER_CUBIC, vc.INTER_NEAREST])
def test_cubic_nearest_route_through_fused(rng, mode):
    """Round-5 VERDICT item 5: non-linear resize pipelines must reach
    the fused kernel instead of silently dropping to the vmapped
    chain (the banded plan is tap-count-agnostic)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, interpolation=mode)
    x = make(rng)
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        before = config.kernel_count("preprocess_fused")
        got = np.asarray(pre(x))
        assert config.kernel_count("preprocess_fused") > before
    with config.backend("jnp"):
        want = np.asarray(Preprocessor(cfg)(x))
    assert got.shape == want.shape == (3, 112, 112)
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_nv_cubic_stays_on_vmapped_chain(rng):
    """The NV camera kernel is linear-only; a cubic NV pipeline must
    fall back (and still be correct via the vmapped chain)."""
    cfg = PreprocessConfig(
        color_code=vc.ColorCode.COLOR_YUV2BGR_NV21,
        out_size=(64, 64), interpolation=vc.INTER_CUBIC,
    )
    nv = rng.integers(0, 256, size=(H * 3 // 2, W), dtype=np.uint8)
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        assert pre._fused_geometry(nv.shape, nv.dtype) is None


def test_explicit_stats_route_through_fused(rng):
    x = make(rng)
    cfg = PreprocessConfig(
        crop_rect=CFG.crop_rect,
        out_size=(112, 112),
        mean=(104.0, 117.0, 123.0),
        stddev=(57.1, 57.4, 58.4),
    )
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        assert pre._fused_geometry(x.shape, x.dtype) is not None
        got = np.asarray(pre(x))
    with config.backend("jnp"):
        want = np.asarray(Preprocessor(cfg)(x))
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_normalize_dispatcher_reaches_pallas_kernel(rng):
    """Standalone normalize (dispatcher) serves the fused kernel for
    the measured-win case: float CHW (the pipeline's post-conversion
    layout).  HWC and u8 inputs route to the XLA path by measurement
    (see the dispatcher comment in ops/normalize.py)."""
    x = rng.integers(0, 256, size=(3, 48, 64)).astype(np.float32)
    img = vc.Image(np.ascontiguousarray(x), vc.CHW)
    with config.backend("pallas"):
        before = config.kernel_count("normalize_fused")
        out = vc.normalize(img)
        assert config.kernel_count("normalize_fused") > before
    ref = vc.normalize(img)  # auto backend on CPU = jnp
    np.testing.assert_allclose(
        np.asarray(out.data), np.asarray(ref.data), atol=1e-4
    )
    # u8 HWC routes to jnp (no kernel count increase).
    y = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    with config.backend("pallas"):
        before = config.kernel_count("normalize_fused")
        vc.normalize(y)
        assert config.kernel_count("normalize_fused") == before


def test_nv_pipeline_routes_through_fused(rng):
    """A color_code=NV21 Preprocessor config runs the one-pass fused
    NV kernel (VERDICT round-2 item 2: camera pipelines no longer pay
    a separate decode + extra HBM round-trip)."""
    from vacv_tpu.utils.io import bgr2nv21_numpy

    h, w = 360, 640
    bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    nv = bgr2nv21_numpy(bgr).reshape(h * 3 // 2, w)
    cfg = PreprocessConfig(
        color_code=vc.ColorCode.COLOR_YUV2BGR_NV21,
        crop_rect=vc.VRect(16, 8, 16 + 600, 8 + 336),
        out_size=(112, 112),
    )
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        geom = pre._fused_geometry(nv.shape, nv.dtype)
        assert geom is not None and geom[0] == (False, False)
        before = config.kernel_count("preprocess_fused_nv")
        out = np.asarray(pre(nv))
        assert config.kernel_count("preprocess_fused_nv") > before
    with config.backend("jnp"):
        want = np.asarray(Preprocessor(cfg)(nv))
    from vacv_tpu.utils.compare import cosine_similarity

    assert out.shape == want.shape == (3, 112, 112)
    assert abs(cosine_similarity(out, want) - 1) < 1e-4


def test_nv_rgb_pipeline_routes_through_fused(rng):
    """RGB-output NV codes also route through the fused kernel (plane
    write order reversed in-kernel)."""
    from vacv_tpu.utils.io import bgr2nv21_numpy
    from vacv_tpu.utils.compare import cosine_similarity

    h, w = 360, 640
    bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    nv = bgr2nv21_numpy(bgr).reshape(h * 3 // 2, w)
    cfg = PreprocessConfig(
        color_code=vc.ColorCode.COLOR_YUV2RGB_NV21,
        # inset crop: a full-height crop would touch the chroma rows a
        # 540-row stacked buffer cannot DMA (540 % 8 != 0) — correctly
        # rejected by the planner
        crop_rect=vc.VRect(16, 8, 16 + 600, 8 + 336),
        out_size=(112, 112),
    )
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        geom = pre._fused_geometry(nv.shape, nv.dtype)
        assert geom is not None and geom[0] == (False, True)
        out = np.asarray(pre(nv))
    with config.backend("jnp"):
        want = np.asarray(Preprocessor(cfg)(nv))
    assert out.shape == want.shape == (3, 112, 112)
    assert abs(cosine_similarity(out, want) - 1) < 1e-4


def test_describe_route():
    """describe_route names the path a shape will take up front."""
    import numpy as np

    import vacv_tpu as vc
    from vacv_tpu.core.types import ColorCode, Layout
    from vacv_tpu.models import PreprocessConfig, Preprocessor

    from vacv_tpu import config

    pre = Preprocessor(PreprocessConfig(
        crop_rect=vc.VRect(64, 28, 1856, 1064), out_size=(224, 224),
        out_layout=Layout.CHW, normalize=True))
    with config.backend("jnp"):
        assert pre.describe_route((1080, 1920, 3)) == "vmapped_chain"
    with config.backend("pallas"):
        assert pre.describe_route((1080, 1920, 3)) == "pallas_fused"
        # f32 input has no fused-kernel plan -> vmapped chain
        assert pre.describe_route((1080, 1920, 3),
                                  np.float32) == "vmapped_chain"

        nv = Preprocessor(PreprocessConfig(
            color_code=ColorCode.COLOR_YUV2BGR_NV21,
            crop_rect=vc.VRect(64, 0, 1856, 1064), out_size=(224, 224),
            out_layout=Layout.CHW, normalize=True))
        assert nv.describe_route((1620, 1920)) == "pallas_fused_nv"

        warped = Preprocessor(PreprocessConfig(
            crop_rect=vc.VRect(64, 36, 2496, 1404),
            warp=(((0.9, 0.03, 40.0), (-0.03, 0.9, 25.0)), (1216, 684)),
            out_size=(224, 224), out_layout=Layout.CHW,
            normalize=True))
        # Round-5: warp-config batches fold the frame axis into the
        # warp kernel's channel axis instead of vmapping per-image.
        assert warped.describe_route((1440, 2560, 3)) == "warp_folded_batch"
    with config.backend("jnp"):
        assert warped.describe_route((1440, 2560, 3)) == "vmapped_chain"


def test_warp_fold_batch_parity(rng):
    """The warp-folded batch path must match the vmapped per-image
    chain (same kernels, different batching — 1-ulp coordinate class)
    and the jnp-backend chain within the normalize-scaled LSB bar."""
    import vacv_tpu as vc
    from vacv_tpu import config
    from vacv_tpu.models import PreprocessConfig, Preprocessor

    cfg = PreprocessConfig(
        crop_rect=vc.VRect(8, 4, 8 + 352, 4 + 240),
        warp=(((0.9, 0.03, 10.0), (-0.03, 0.9, 5.0)), (304, 168)),
        out_size=(112, 112), out_layout=vc.CHW, normalize=True)
    x = rng.integers(0, 256, size=(3, 256, 384, 3), dtype=np.uint8)
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        assert pre.describe_route(x.shape[1:]) == "warp_folded_batch"
        got = np.asarray(pre.batch(x))
        per = np.stack([np.asarray(pre(x[i])) for i in range(3)])
    with config.backend("jnp"):
        want = np.asarray(Preprocessor(cfg).batch(x))
    assert got.shape == want.shape == (3, 3, 112, 112)
    np.testing.assert_allclose(got, per, atol=5e-2)
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_warp_fold_batch_f32(rng):
    """f32 frame batches take the fold too (the kernel's f32 path)."""
    import vacv_tpu as vc
    from vacv_tpu import config
    from vacv_tpu.models import PreprocessConfig, Preprocessor

    cfg = PreprocessConfig(
        warp=(((0.9, 0.03, 10.0), (-0.03, 0.9, 5.0)), (304, 168)),
        out_size=(112, 112), out_layout=vc.CHW, normalize=True)
    x = rng.integers(0, 256, size=(2, 256, 384, 3)).astype(np.float32)
    with config.backend("pallas"):
        pre = Preprocessor(cfg)
        assert pre.describe_route(x.shape[1:], x.dtype) == "warp_folded_batch"
        got = np.asarray(pre.batch(x))
    with config.backend("jnp"):
        want = np.asarray(Preprocessor(cfg).batch(x))
    assert got.shape == want.shape == (2, 3, 112, 112)
    np.testing.assert_allclose(got, want, atol=5e-2)
