"""Differential tests for the fused Pallas preprocess kernel.

``preprocess_fused_batch`` (crop -> bilinear resize -> CHW f32 ->
normalize in one HBM pass) vs the jnp pipeline built from the same
dispatcher ops: crop -> resize(u8, Q11 trunc) -> CHW -> f32 ->
normalize_jnp.  On CPU the kernel runs in interpret mode with
``precise=True`` (Dekker-split bf16 matmuls, exact to f32
accumulation); parity bar is <=1 u8 LSB on the resized pixels and
cosine >= 1-1e-6 end-to-end.

Reference parity anchors: crop.cpp:127-131 (rect), resize_naive.cpp:
10-68 (Q11 bilinear), normalize.cpp:84-120 (normalize chain).
"""
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.core.types import Layout
from vacv_tpu.ops.crop import crop
from vacv_tpu.ops.normalize import normalize_jnp
from vacv_tpu.ops.pallas.preprocess import plan_supported, preprocess_fused_batch
from vacv_tpu.ops.resize import resize
from vacv_tpu.utils.compare import cosine_similarity

H, W = 360, 640  # W*3 = 1920 lanes (mult of 128)
RECT = vc.VRect(17, 20, 17 + 600, 20 + 320)  # left, top, right, bottom
OUT = (112, 96)  # (w, h)


def make_batch(rng, n=2, h=H, w=W):
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def jnp_pipeline(batch, rect, out_size, mean=None, stddev=None, normalize=True):
    """Per-image jnp reference chain over the batch."""
    outs = []
    ow, oh = out_size
    for i in range(batch.shape[0]):
        img = vc.Image(batch[i], Layout.HWC)
        if rect is not None:
            img = crop(img, rect)
        img = resize(img, (ow, oh))  # u8 in/out, Q11 trunc parity
        img = img.change_layout(vc.CHW).change_dtype("float32")
        if normalize:
            img = normalize_jnp(img, mean, stddev)
        outs.append(np.asarray(img.data))
    return np.stack(outs)


def test_plan_supported_bench_config():
    # The headline bench shape must be in-plan.
    assert plan_supported(1080, 1920, 64, 1792, 1036, 224, 224)


def test_plan_rejects_unsupported():
    # non-128-multiple widths and odd heights now plan via the
    # wrapper's pad (round-3 gate lift) — including the reference's
    # own 176x144 and 284x214 assets
    assert plan_supported(360, 630, 0, 630, 360, 224, 224)
    assert plan_supported(144, 176, 0, 176, 144, 224, 224)
    assert plan_supported(214, 284, 0, 284, 214, 224, 224)
    # crop height below the smallest DMA chunk (32 rows)
    assert not plan_supported(360, 640, 0, 640, 24, 64, 64)
    # 96-row crops now plan with an adaptively smaller chunk
    assert plan_supported(360, 640, 0, 640, 96, 64, 64)
    with pytest.raises(ValueError):
        preprocess_fused_batch(  # 24-row crop: below the chunk floor
            np.zeros((1, 360, 640, 3), np.uint8),
            vc.VRect(0, 0, 640, 24), (64, 64)
        )


def test_fused_matches_jnp_pipeline(rng):
    batch = make_batch(rng)
    got = np.asarray(
        preprocess_fused_batch(batch, RECT, OUT, precise=True)
    )
    want = jnp_pipeline(batch, RECT, OUT)
    assert got.shape == want.shape == (2, 3, OUT[1], OUT[0])
    assert abs(cosine_similarity(got, want) - 1) < 1e-6
    assert np.max(np.abs(got - want)) < 0.05  # normalized units


def test_fused_resize_only_lsb_parity(rng):
    """normalize=False exposes the raw truncated resize values."""
    batch = make_batch(rng, n=1)
    got = np.asarray(
        preprocess_fused_batch(batch, RECT, OUT, precise=True, normalize=False)
    )
    want = jnp_pipeline(batch, RECT, OUT, normalize=False)
    assert np.max(np.abs(got - want)) <= 1.0  # <=1 u8 LSB at floor boundaries
    assert (np.abs(got - want) > 0).mean() < 1e-3


def test_fused_full_frame_no_crop(rng):
    batch = make_batch(rng, n=1, h=256, w=384)  # 384*3=1152 lanes
    got = np.asarray(
        preprocess_fused_batch(batch, None, (128, 128), precise=True)
    )
    want = jnp_pipeline(batch, None, (128, 128))
    assert abs(cosine_similarity(got, want) - 1) < 1e-6


def test_fused_explicit_stats(rng):
    batch = make_batch(rng, n=1)
    mean = (104.0, 117.0, 123.0)
    stddev = (57.1, 57.4, 58.4)
    got = np.asarray(
        preprocess_fused_batch(
            batch, RECT, OUT, mean=mean, stddev=stddev, precise=True
        )
    )
    want = jnp_pipeline(batch, RECT, OUT, mean=mean, stddev=stddev)
    assert abs(cosine_similarity(got, want) - 1) < 1e-6
    assert np.max(np.abs(got - want)) < 0.05


def test_fused_partial_stats(rng):
    """mean given, stddev self-computed (in-kernel, around the
    self-mean — matching normalize_jnp's partial-stats convention)."""
    batch = make_batch(rng, n=1)
    mean = (104.0, 117.0, 123.0)
    got = np.asarray(
        preprocess_fused_batch(batch, RECT, OUT, mean=mean, precise=True)
    )
    want = jnp_pipeline(batch, RECT, OUT, mean=mean)
    assert abs(cosine_similarity(got, want) - 1) < 1e-6
    assert np.max(np.abs(got - want)) < 0.05


def test_fused_runtime_top(rng):
    """A traced ``top`` must give the same result as the static rect."""
    batch = make_batch(rng, n=1)
    static = np.asarray(
        preprocess_fused_batch(batch, RECT, OUT, precise=True)
    )
    dynamic = np.asarray(
        preprocess_fused_batch(
            batch, RECT, OUT, top=np.int32(int(RECT.top)), precise=True
        )
    )
    np.testing.assert_array_equal(static, dynamic)
    # A different runtime top equals the jnp pipeline with that rect.
    top2 = 13
    rect2 = vc.VRect(RECT.left, top2, RECT.right, top2 + 320)
    moved = np.asarray(
        preprocess_fused_batch(batch, RECT, OUT, top=np.int32(top2), precise=True)
    )
    want = jnp_pipeline(batch, rect2, OUT)
    assert abs(cosine_similarity(moved, want) - 1) < 1e-6


def test_fused_odd_geometry_assets(rng):
    """The reference's own odd-geometry assets (176x144, 284x214) run
    through the fused kernel (round-3 gate lift: wrapper row/lane pad)
    and match the jnp chain."""
    import jax.numpy as jnp

    import vacv_tpu as vc
    from vacv_tpu.utils.compare import cosine_similarity

    for h, w, rect in [(144, 176, None), (214, 284, None),
                       (214, 284, vc.VRect(10, 6, 270, 202))]:
        batch = jnp.asarray(
            rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
        )
        out = np.asarray(
            preprocess_fused_batch(batch, rect, (224, 224), precise=True)
        )
        ref = jnp_pipeline(np.asarray(batch), rect, (224, 224))
        c = cosine_similarity(out, ref)
        assert abs(c - 1) < 1e-4, (h, w, rect, c)


# ---- NV camera input (decode folded into the fused kernel) -------------

def _nv_ref_pipeline(nv_batch, code, rect, out_size, mean=None,
                     stddev=None):
    """decode → crop → resize → CHW f32 → normalize via the jnp ops."""
    outs = []
    ow, oh = out_size
    for i in range(nv_batch.shape[0]):
        img = vc.cvt_color(np.asarray(nv_batch[i]), code)
        if rect is not None:
            img = crop(img, rect)
        img = resize(img, (ow, oh))
        img = img.change_layout(vc.CHW).change_dtype("float32")
        img = normalize_jnp(img, mean, stddev)
        outs.append(np.asarray(img.data))
    return np.stack(outs)


def _make_nv(rng, n, h, w):
    from vacv_tpu.utils.io import bgr2nv21_numpy

    return np.stack([
        bgr2nv21_numpy(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ).reshape(h * 3 // 2, w)
        for _ in range(n)
    ])


@pytest.mark.parametrize("is_nv12", [False, True])
def test_fused_nv_matches_decode_chain(rng, is_nv12):
    from vacv_tpu.ops.pallas.preprocess import (
        nv_plan_supported, preprocess_fused_nv_batch,
    )

    h, w = 360, 640
    nv = _make_nv(rng, 2, h, w)
    code = (vc.ColorCode.COLOR_YUV2BGR_NV12 if is_nv12
            else vc.ColorCode.COLOR_YUV2BGR_NV21)
    rect = vc.VRect(17, 24, 17 + 600, 24 + 320)
    assert nv_plan_supported(h, w, 17, 600, 320, 96, 112)
    got = np.asarray(preprocess_fused_nv_batch(
        nv, rect, (112, 96), is_nv12=is_nv12, precise=True
    ))
    want = _nv_ref_pipeline(nv, code, rect, (112, 96))
    assert got.shape == want.shape == (2, 3, 96, 112)
    assert abs(cosine_similarity(got, want) - 1) < 1e-6


def test_fused_nv_full_frame_explicit_stats(rng):
    from vacv_tpu.ops.pallas.preprocess import preprocess_fused_nv_batch

    h, w = 144, 176  # the akiyo_qcif camera config — w lane-padded
    nv = _make_nv(rng, 1, h, w)
    mean = (104.0, 117.0, 123.0)
    stddev = (57.1, 57.4, 58.4)
    got = np.asarray(preprocess_fused_nv_batch(
        nv, None, (128, 96), mean=mean, stddev=stddev, precise=True
    ))
    want = _nv_ref_pipeline(
        nv, vc.ColorCode.COLOR_YUV2BGR_NV21, None, (128, 96),
        mean=mean, stddev=stddev,
    )
    assert abs(cosine_similarity(got, want) - 1) < 1e-6


def test_fused_nv_rejects_unsupported():
    from vacv_tpu.ops.pallas.preprocess import nv_plan_supported

    # odd Y height (not 8-aligned) -> decode + jnp chain
    assert not nv_plan_supported(214, 284, 0, 284, 214, 224, 224)
    # crop below the chunk floor
    assert not nv_plan_supported(360, 640, 0, 640, 24, 64, 64)


def test_fused_nv_bottom_and_full_crops_plan():
    """Round-4 lift: the stacked buffer is wrapper-padded to 8-aligned
    rows, so h*3/2 % 8 != 0 no longer makes the last chroma rows
    DMA-unreachable — bottom and full-height crops now plan."""
    from vacv_tpu.ops.pallas.preprocess import nv_plan_supported

    # h=1080: buffer rows 1620 (1620 % 8 = 4).  Full-height crop plans.
    assert nv_plan_supported(1080, 1920, 0, 1920, 1080, 224, 224)
    # Bottom crop (rows 44..1080) plans too.
    assert nv_plan_supported(1080, 1920, 64, 1792, 1036, 224, 224, top=44)
    # The standard inset crop keeps planning.
    assert nv_plan_supported(1080, 1920, 64, 1792, 1036, 224, 224, top=28)
    # h=720: buffer rows 1080 (mult of 8) — unchanged.
    assert nv_plan_supported(720, 1280, 0, 1280, 720, 224, 224)
    # h=360 full-height (540 buffer rows, % 8 = 4): now plans.
    assert nv_plan_supported(360, 640, 0, 640, 360, 224, 224)
    # Runtime-top planning (top=None validates every admissible top).
    assert nv_plan_supported(1080, 1920, 64, 1792, 720, 224, 224, top=None)


def test_fused_nv_full_height_matches_chain(rng):
    """The newly-planable full-height crop of a short NV frame must
    match the decode+chain reference."""
    from vacv_tpu.ops.pallas.preprocess import preprocess_fused_nv_batch

    nv = _make_nv(rng, 2, 360, 640)
    got = np.asarray(preprocess_fused_nv_batch(
        nv, None, (112, 96), precise=True))
    want = _nv_ref_pipeline(
        nv, vc.ColorCode.COLOR_YUV2BGR_NV21, None, (112, 96))
    assert abs(cosine_similarity(got, want) - 1) < 1e-6


@pytest.mark.parametrize("top", [0, 4, 37, 120])
def test_fused_nv_runtime_top_matches_static(rng, top):
    """Round-4 lift: a runtime crop top (python int or traced scalar)
    must reproduce the equivalent static-top result exactly."""
    from vacv_tpu.ops.pallas.preprocess import preprocess_fused_nv_batch

    h, w, ch = 360, 640, 224
    nv = _make_nv(rng, 1, h, w)
    rect = vc.VRect(32, top, 32 + 512, top + ch)
    want = np.asarray(preprocess_fused_nv_batch(
        nv, rect, (128, 96), precise=True))
    rect0 = vc.VRect(32, 0, 32 + 512, ch)
    got = np.asarray(preprocess_fused_nv_batch(
        nv, rect0, (128, 96), top=np.int32(top), precise=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_odd_output_height(rng):
    """Odd (non-multiple-of-8) output heights: the accumulator pads to
    ceil8(oh) and the out-row windows stay 8-ALIGNED (round-3 review
    finding: the oh - row_win clamp broke the alignment the kernel's
    multiple_of hint promises — silent corruption on device)."""
    from vacv_tpu.ops.pallas.preprocess import _plan

    p = _plan(360, 640, 0, 640, 360, 100, 100)
    assert p is not None
    assert all(r % 8 == 0 for r in p.out_row0), p.out_row0
    batch = make_batch(rng, n=2)
    got = np.asarray(
        preprocess_fused_batch(batch, None, (100, 100), precise=True)
    )
    want = jnp_pipeline(batch, None, (100, 100))
    assert got.shape == want.shape == (2, 3, 100, 100)
    assert abs(cosine_similarity(got, want) - 1) < 1e-6


def test_fused_rejects_out_of_frame_crop(rng):
    """Crops past the REAL frame edge must be rejected, not silently
    resized over pad pixels (round-3 review finding)."""
    assert not plan_supported(144, 176, 100, 100, 144, 64, 64)
    with pytest.raises(ValueError):
        preprocess_fused_batch(
            make_batch(rng, n=1, h=144, w=176),
            vc.VRect(100, 0, 200, 144), (64, 64),
        )


def test_fused_nv_inset_crop_skips_row_pad():
    """Round-4 review finding: inset crops of h*3//2 % 8 != 0 frames
    must not pay the full-batch row-pad copy; only crops whose chroma
    windows reach the misaligned tail may set needs_pad."""
    from vacv_tpu.ops.pallas.preprocess import _nv_pad_w, _plan_nv

    wp = _nv_pad_w(1920)
    inset = _plan_nv(1080, wp, 28, 64, 1792, 1036, 224, 224)
    assert inset is not None and not inset.needs_pad
    full = _plan_nv(1080, wp, 0, 0, 1920, 1080, 224, 224)
    assert full is not None and full.needs_pad
    # aligned-buffer frames (720p: 1080 rows) never need the pad
    aligned = _plan_nv(720, _nv_pad_w(1280), 0, 0, 1280, 720, 224, 224)
    assert aligned is not None and not aligned.needs_pad
