"""Pallas warp kernel vs the jnp reference (interpret mode on CPU)."""
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.ops.pallas.warp_affine import warp_affine_pallas, warp_supported
from vacv_tpu.ops.warp_affine import _warp_planes, invert_affine

MATRICES = [
    np.array([[0.85, 0.05, 12.0], [-0.05, 0.85, 9.0]], np.float32),
    np.array([[1.2, -0.08, -20.0], [0.08, 1.2, 5.0]], np.float32),
    np.array([[0.5, 0.0, 300.0], [0.0, 0.5, 200.0]], np.float32),  # mostly OOB
]


@pytest.mark.parametrize("mi", range(len(MATRICES)))
@pytest.mark.parametrize("u8", [True, False])
def test_kernel_matches_jnp(bgr_640x360, mi, u8):
    import jax.numpy as jnp

    m = MATRICES[mi]
    minv = invert_affine(m)
    assert warp_supported(minv, 360, 640, 1 if u8 else 4)
    src = bgr_640x360 if u8 else bgr_640x360.astype(np.float32)
    planes = jnp.transpose(jnp.asarray(src), (2, 0, 1))
    h_out, w_out = 200, 250

    out_k = np.asarray(warp_affine_pallas(
        planes, minv, h_out, w_out, u8=u8, border_value=0.0))
    ref = _warp_planes(
        planes.astype(jnp.float32), minv, h_out, w_out, u8=u8,
        border_value=0.0, edge_mode="opencv",
    )
    if u8:
        ref = np.clip(np.floor(np.asarray(ref) + 1e-4), 0, 255).astype(np.uint8)
        diff = np.abs(out_k.astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.005
    else:
        # fx = m0*dx + m1*dy + m2 is contraction-order sensitive: one
        # f32 ulp of fx (~2^-16 at fx~200) moves the fractional weight
        # by ~1.5e-5, i.e. up to ~0.004 on 0..255 data.  Both kernel
        # and jnp reference carry this; bound by that math (plus
        # margin), not the 1e-3 that only some inputs satisfy.
        np.testing.assert_allclose(out_k, np.asarray(ref), atol=5e-3)


def test_kernel_border_value(bgr_640x360):
    import jax.numpy as jnp

    m = np.array([[1.0, 0.0, -720.0], [0.0, 1.0, -440.0]], np.float32)
    minv = invert_affine(m)
    planes = jnp.transpose(jnp.asarray(bgr_640x360), (2, 0, 1))
    out = np.asarray(warp_affine_pallas(
        planes, minv, 64, 64, u8=True, border_value=17.0))
    assert (out == 17).all()


def test_kernel_vmap_batched(bgr_640x360, rng):
    # Preprocessor pipelines vmap over frames; the kernel must batch
    # correctly (program_id axes shift under pallas vmap rules).
    import jax
    import jax.numpy as jnp

    m = MATRICES[0]
    minv = invert_affine(m)
    other = rng.integers(0, 256, bgr_640x360.shape, dtype=np.uint8)
    batch = jnp.stack(
        [jnp.transpose(jnp.asarray(x), (2, 0, 1)) for x in (bgr_640x360, other)]
    )
    f = lambda p: warp_affine_pallas(p, minv, 96, 200, u8=True, border_value=0.0)
    out_v = np.asarray(jax.vmap(f)(batch))
    for i in range(2):
        # Interpret mode (XLA:CPU) applies LLVM-level FMA contraction
        # that can differ between the vmapped and plain lowerings by
        # 1 ulp of fx, flipping a Q11 weight at exact-half knife
        # edges (~0.03% of pixels on noise inputs).  On device both
        # run the same Mosaic program and are identical.
        one = np.asarray(f(batch[i]))
        diff = np.abs(out_v[i].astype(int) - one.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3


def test_kernel_large_rotation(bgr_640x360):
    # 40-degree rotation: wide row-span band (rh hits its bh cap, the
    # adaptive tile height backs off) — exercises the non-narrowed
    # code paths of the selection-matmul kernel.
    import jax.numpy as jnp

    c, s = np.cos(np.deg2rad(40)), np.sin(np.deg2rad(40))
    m = np.array([[c, -s, 220.0], [s, c, -80.0]], np.float32)
    minv = invert_affine(m)
    if not warp_supported(minv, 360, 640, 1):
        pytest.skip("band exceeds kernel limits for this config")
    planes = jnp.transpose(jnp.asarray(bgr_640x360), (2, 0, 1))
    out_k = np.asarray(warp_affine_pallas(
        planes, minv, 300, 400, u8=True, border_value=0.0))
    ref = _warp_planes(
        planes.astype(jnp.float32), minv, 300, 400, u8=True,
        border_value=0.0, edge_mode="opencv",
    )
    ref = np.clip(np.floor(np.asarray(ref) + 1e-4), 0, 255).astype(np.uint8)
    diff = np.abs(out_k.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005


def test_kernel_tall_output_tiles(bgr_640x360):
    # Output taller than one 32-row tile and not a multiple of it, plus
    # a non-128-multiple width: exercises tile padding + trimming.
    import jax.numpy as jnp

    m = MATRICES[0]
    minv = invert_affine(m)
    planes = jnp.transpose(jnp.asarray(bgr_640x360), (2, 0, 1))
    out_k = np.asarray(warp_affine_pallas(
        planes, minv, 333, 187, u8=True, border_value=3.0))
    ref = _warp_planes(
        planes.astype(jnp.float32), minv, 333, 187, u8=True,
        border_value=3.0, edge_mode="opencv",
    )
    ref = np.clip(np.floor(np.asarray(ref) + 1e-4), 0, 255).astype(np.uint8)
    diff = np.abs(out_k.astype(int) - ref.astype(int))
    assert diff.max() <= 1


# ---- streaming row-band mode (large planes) ----------------------------


@pytest.mark.parametrize("u8", [True, False])
def test_streaming_mode_matches_resident(rng, u8):
    """Force the streaming path by shrinking the plane budget; results
    must be identical to the resident-mode kernel."""
    import jax.numpy as jnp

    from vacv_tpu.ops.pallas import warp_affine as wp

    h, w = 256, 640  # h%8==0, w%128==0 (streaming gate)
    src = rng.integers(0, 256, size=(3, h, w), dtype=np.uint8)
    if not u8:
        src = src.astype(np.float32)
    m = np.array([[0.9, 0.03, 8.0], [-0.03, 0.9, 5.0]], np.float32)
    minv = invert_affine(m)

    res = np.asarray(warp_affine_pallas(
        jnp.asarray(src), minv, 180, 300, u8=u8, border_value=0.0))

    old = wp._PLANE_BUDGET
    wp._PLANE_BUDGET = 1  # force streaming
    wp._call._clear_cache()
    try:
        assert wp._stream_ok(minv, h, w, 300, 1 if u8 else 4)
        got = np.asarray(warp_affine_pallas(
            jnp.asarray(src), minv, 180, 300, u8=u8, border_value=0.0))
    finally:
        wp._PLANE_BUDGET = old
        wp._call._clear_cache()
    np.testing.assert_array_equal(got, res)


def test_streaming_gate_geometry():
    from vacv_tpu.ops.pallas import warp_affine as wp

    m = np.array([[0.85, 0.012, -474.0], [-0.012, 0.85, -379.0]], np.float32)
    minv = invert_affine(m)
    # 2560x1440 f32 = 14 MB/plane: resident mode impossible, streaming on
    assert wp.warp_supported(minv, 1440, 2560, 4, w_out=2560)
    # odd geometry falls back to the jnp gather
    assert not wp._stream_ok(minv, 1441, 2560, 2560, 4)
    assert not wp._stream_ok(minv, 1440, 2550, 2550, 4)


def test_short_wide_plane_over_budget(rng):
    """Regression (round-3 advisor): a short, wide f32 plane over the
    resident budget used to pass ``warp_supported`` but crash at trace
    time — the streamed band (rbh=h_in) was shorter than the per-block
    vertical window rh.  Streaming must reject (rbh < rh) and the plan
    fall to the padded one-channel-resident mode."""
    import jax.numpy as jnp

    from vacv_tpu.ops.pallas import warp_affine as wp

    h, w = 112, 6272
    minv = np.array([[0.0, 1.2, 4.0], [0.82, 0.0, 2.0]], np.float32)
    assert wp._stream_plan(minv, wp._T, wp._pick_lb(minv),
                           wp._rh(minv, wp._T, wp._pick_lb(minv)),
                           w, 3, h, w, 4) is None
    plan = wp._plan(minv, 3, h, w, h, 256, 4)
    if plan is not None:  # resident fallback must actually trace+run
        src = rng.random((3, h, w), dtype=np.float32)
        out = warp_affine_pallas(jnp.asarray(src), minv, 64, 256,
                                 u8=False, border_value=0.0)
        ref = _warp_planes(jnp.asarray(src), minv, 64, 256, u8=False,
                           border_value=0.0, edge_mode="opencv")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-3)


@pytest.mark.parametrize("scale", [3.0, 6.0])
def test_kernel_narrow_lane_blocks(bgr_640x360, scale):
    """Large downscales pick narrower lane-blocks (lb=32/16) so the
    tap span fits the fixed K=128 window — exercises the non-default
    lb paths of the round-3 kernel."""
    import jax.numpy as jnp

    from vacv_tpu.ops.pallas import warp_affine as wp

    m = np.array([[1.0 / scale, 0.02, 4.0], [-0.02, 1.0 / scale, 6.0]],
                 np.float32)
    minv = invert_affine(m)
    lb = wp._pick_lb(minv)
    assert lb in (16, 32), lb
    planes = jnp.transpose(jnp.asarray(bgr_640x360), (2, 0, 1))
    h_out, w_out = 96, 180
    out_k = np.asarray(warp_affine_pallas(
        planes, minv, h_out, w_out, u8=True, border_value=0.0))
    ref = _warp_planes(
        planes.astype(jnp.float32), minv, h_out, w_out, u8=True,
        border_value=0.0, edge_mode="opencv",
    )
    ref = np.clip(np.floor(np.asarray(ref) + 1e-4), 0, 255).astype(np.uint8)
    diff = np.abs(out_k.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005


@pytest.mark.parametrize("u8", [True, False])
def test_kernel_nearest_matches_jnp(bgr_640x360, u8):
    """INTER_NEAREST routes to the kernel (round-4 mode lift) and is an
    EXACT copy of the jnp gather's picks (3-term bf16 split for f32)."""
    import jax.numpy as jnp

    from vacv_tpu import config
    from vacv_tpu.core.types import InterMode

    m = MATRICES[0]
    minv = invert_affine(m)
    src = bgr_640x360 if u8 else bgr_640x360.astype(np.float32)
    planes = jnp.transpose(jnp.asarray(src), (2, 0, 1))
    out_k = np.asarray(warp_affine_pallas(
        planes, minv, 200, 250, u8=u8, border_value=0.0, nearest=True))
    ref = _warp_planes(
        planes.astype(jnp.float32), minv, 200, 250, u8=u8,
        border_value=0.0, edge_mode="opencv",
        interp=InterMode.INTER_NEAREST,
    )
    if u8:
        ref = np.clip(np.floor(np.asarray(ref) + 0.5), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(out_k, np.asarray(ref))
    else:
        np.testing.assert_array_equal(out_k, np.asarray(ref))


@pytest.mark.parametrize("border", ["replicate", "reflect", "reflect_101", "wrap"])
@pytest.mark.parametrize("u8", [True, False])
def test_kernel_border_modes_via_pad(bgr_640x360, border, u8):
    """The coordinate-remap border modes route to the kernel through
    the pad-plan (round-4 mode lift) and match the jnp remap path."""
    import jax.numpy as jnp

    import vacv_tpu as vc
    from vacv_tpu import config
    from vacv_tpu.core.types import BorderMode

    bm = {
        "replicate": BorderMode.BORDER_REPLICATE,
        "reflect": BorderMode.BORDER_REFLECT,
        "reflect_101": BorderMode.BORDER_REFLECT_101,
        "wrap": BorderMode.BORDER_WRAP,
    }[border]
    # Forward translation +40/+30: inverse taps overshoot the left and
    # top edges by ~40/30 px, well inside the pad cap.
    m = np.array([[1.0, 0.02, 40.0], [-0.02, 1.0, 30.0]], np.float32)
    src = bgr_640x360 if u8 else bgr_640x360.astype(np.float32)
    before = config.kernel_count("warp_affine")
    with config.backend("pallas"):
        out = vc.warp_affine(src, m, (320, 200), border_mode=bm)
    assert config.kernel_count("warp_affine") > before, "kernel not routed"
    with config.backend("jnp"):
        ref = vc.warp_affine(src, m, (320, 200), border_mode=bm)
    got, want = np.asarray(out.data), np.asarray(ref.data)
    if u8:
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.005
    else:
        np.testing.assert_allclose(got, want, atol=5e-3)


def test_kernel_vacv_edge_mode_routes(bgr_640x360):
    """edge_mode='vacv' (and BORDER_TRANSPARENT) now runs the kernel
    plus the support post-mask instead of the gather fallback."""
    import vacv_tpu as vc
    from vacv_tpu import config

    m = MATRICES[0]
    before = config.kernel_count("warp_affine")
    with config.backend("pallas"):
        out = vc.warp_affine(bgr_640x360, m, (320, 200), edge_mode="vacv",
                             border_value=7.0)
    assert config.kernel_count("warp_affine") > before
    with config.backend("jnp"):
        ref = vc.warp_affine(bgr_640x360, m, (320, 200), edge_mode="vacv",
                             border_value=7.0)
    diff = np.abs(np.asarray(out.data).astype(int)
                  - np.asarray(ref.data).astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005


def test_border_pad_plan_gates():
    from vacv_tpu.ops.warp_affine import _border_pad_plan

    # Small overshoot: padded on the two overshooting sides only.
    m = np.array([[1.0, 0.0, 10.0], [0.0, 1.0, 8.0]], np.float32)
    minv = invert_affine(m)
    plan = _border_pad_plan(minv, 360, 640, 360, 640)
    assert plan is not None
    pt, pb, pl_, pr = plan
    assert pt >= 8 and pl_ >= 10 and pb == 0 and pr == 0
    # Overshoot beyond the cap: rejected (jnp gather serves it).
    m = np.array([[1.0, 0.0, 500.0], [0.0, 1.0, 0.0]], np.float32)
    assert _border_pad_plan(invert_affine(m), 360, 640, 360, 640) is None


def test_kernel_nearest_transparent_no_vacv_mask(bgr_640x360):
    """Round-4 review finding: the vacv skip-edge post-mask is a
    LINEAR-only semantic (the reference's nearest path came from its
    OpenCV fallback) — the kernel route must match the jnp route,
    which never masks nearest."""
    import vacv_tpu as vc
    from vacv_tpu import config
    from vacv_tpu.core.types import BorderMode, InterMode

    m = np.array([[0.9, 0.05, 10.0], [-0.05, 0.9, 5.0]], np.float32)
    kw = dict(flags=InterMode.INTER_NEAREST,
              border_mode=BorderMode.BORDER_TRANSPARENT)
    with config.backend("pallas"):
        out = vc.warp_affine(bgr_640x360, m, (320, 200), **kw)
    with config.backend("jnp"):
        ref = vc.warp_affine(bgr_640x360, m, (320, 200), **kw)
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data))


@pytest.mark.parametrize("u8", [True, False])
@pytest.mark.parametrize("mi", [0, 1])
def test_kernel_cubic_matches_jnp(bgr_640x360, mi, u8):
    """Round-4: INTER_CUBIC routes to the kernel (4x4 A=-0.75 taps,
    four selection fields) and matches the jnp gather reference."""
    import jax.numpy as jnp

    from vacv_tpu import config
    from vacv_tpu.core.types import InterMode
    from vacv_tpu.ops.pallas import warp_affine as wp

    m = MATRICES[mi]
    minv = invert_affine(m)
    assert wp.warp_supported(minv, 360, 640, 1 if u8 else 4,
                             w_out=250, h_out=200, interp="cubic")
    src = bgr_640x360 if u8 else bgr_640x360.astype(np.float32)
    planes = jnp.transpose(jnp.asarray(src), (2, 0, 1))
    out_k = np.asarray(warp_affine_pallas(
        planes, minv, 200, 250, u8=u8, border_value=0.0, interp="cubic"))
    ref = _warp_planes(
        planes.astype(jnp.float32), minv, 200, 250, u8=u8,
        border_value=0.0, edge_mode="opencv",
        interp=InterMode.INTER_CUBIC,
    )
    if u8:
        ref = np.clip(np.floor(np.asarray(ref) + 0.5), 0, 255).astype(np.uint8)
        diff = np.abs(out_k.astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.01
    else:
        np.testing.assert_allclose(out_k, np.asarray(ref), atol=2e-2)


def test_dispatcher_routes_cubic(bgr_640x360):
    import vacv_tpu as vc
    from vacv_tpu import config

    m = MATRICES[0]
    before = config.kernel_count("warp_affine")
    with config.backend("pallas"):
        out = vc.warp_affine(bgr_640x360, m, (320, 200),
                             flags=vc.INTER_CUBIC)
    assert config.kernel_count("warp_affine") > before
    with config.backend("jnp"):
        ref = vc.warp_affine(bgr_640x360, m, (320, 200),
                             flags=vc.INTER_CUBIC)
    diff = np.abs(np.asarray(out.data).astype(int)
                  - np.asarray(ref.data).astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
