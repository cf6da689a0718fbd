"""Seeded geometry fuzz: random configs through the fused planners and
the warp kernel vs their jnp references.

The planner edge cases (alignment clamps, window coverage, pad
interactions) are where this round's real bugs lived — the odd-oh
window misalignment and the padded-frame crop hole were both plan-time
geometry cases no hand-written test covered.  This sweep draws sizes,
crops, and output shapes from a fixed seed so failures reproduce.
"""
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.core.types import Layout
from vacv_tpu.ops.crop import crop
from vacv_tpu.ops.normalize import normalize_jnp
from vacv_tpu.ops.pallas.preprocess import (
    plan_supported, preprocess_fused_batch,
)
from vacv_tpu.ops.resize import resize
from vacv_tpu.utils.compare import cosine_similarity


def _jnp_chain(frame, rect, out_size):
    img = vc.Image(frame, Layout.HWC)
    if rect is not None:
        img = crop(img, rect)
    img = resize(img, out_size)
    img = img.change_layout(vc.CHW).change_dtype("float32")
    return np.asarray(normalize_jnp(img).data)


def test_fuzz_fused_preprocess_geometries():
    rng = np.random.default_rng(20260821)
    ran = 0
    for _ in range(60):
        h = int(rng.integers(40, 400))
        w = int(rng.integers(40, 500))
        if rng.random() < 0.5:
            rect, left, top, cw, ch = None, 0, 0, w, h
        else:
            left = int(rng.integers(0, w // 3))
            top = int(rng.integers(0, h // 3))
            cw = int(rng.integers(max(1, w // 2), w - left))
            ch = int(rng.integers(max(1, h // 2), h - top))
            rect = vc.VRect(left, top, left + cw, top + ch)
        ow = int(rng.integers(16, 200))
        oh = int(rng.integers(16, 200))
        if not plan_supported(h, w, left, cw, ch, oh, ow):
            continue
        if ran >= 10:  # interpret mode is slow; 10 planned configs
            break
        ran += 1
        frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = np.asarray(preprocess_fused_batch(
            frame[None], rect, (ow, oh), precise=True
        ))[0]
        want = _jnp_chain(frame, rect, (ow, oh))
        c = cosine_similarity(got, want)
        assert abs(c - 1) < 1e-5, (h, w, rect, (ow, oh), c)
    assert ran >= 5  # the sweep must actually exercise the kernel


def test_fuzz_warp_geometries():
    from vacv_tpu.ops.pallas.warp_affine import (
        warp_affine_pallas, warp_supported,
    )
    from vacv_tpu.ops.warp_affine import _warp_planes, invert_affine

    rng = np.random.default_rng(4242)
    ran = 0
    for _ in range(40):
        h = int(rng.integers(48, 360))
        w = int(rng.integers(48, 520))
        ang = float(rng.uniform(-25, 25))
        scale = float(rng.uniform(0.4, 2.2))
        c, s = np.cos(np.deg2rad(ang)) / scale, np.sin(np.deg2rad(ang)) / scale
        m = np.array([[c, -s, float(rng.uniform(-30, 30))],
                      [s, c, float(rng.uniform(-30, 30))]], np.float32)
        minv = invert_affine(m)
        oh = int(rng.integers(16, 260))
        ow = int(rng.integers(16, 300))
        if not warp_supported(minv, h, w, 1, w_out=ow, h_out=oh):
            continue
        if ran >= 8:
            break
        ran += 1
        import jax.numpy as jnp

        planes = jnp.asarray(
            rng.integers(0, 256, (3, h, w), dtype=np.uint8)
        )
        got = np.asarray(warp_affine_pallas(
            planes, minv, oh, ow, u8=True, border_value=0.0
        ))
        ref = _warp_planes(
            planes.astype(jnp.float32), minv, oh, ow, u8=True,
            border_value=0.0, edge_mode="opencv",
        )
        ref = np.clip(np.floor(np.asarray(ref) + 1e-4), 0, 255).astype(np.uint8)
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 1, (h, w, m.tolist(), (oh, ow), diff.max())
        assert (diff > 0).mean() < 0.01
    assert ran >= 5


def test_fuzz_nv_fused_geometries():
    from vacv_tpu.core.types import ColorCode
    from vacv_tpu.ops.pallas.preprocess import (
        nv_plan_supported, preprocess_fused_nv_batch,
    )
    from vacv_tpu.utils.io import bgr2nv21_numpy

    rng = np.random.default_rng(777)
    ran = 0
    for _ in range(60):
        h = int(rng.integers(6, 45)) * 8      # NV gate: h % 8 == 0
        w = int(rng.integers(24, 250)) * 2    # even width
        if rng.random() < 0.5:
            rect, left, top, cw, ch = None, 0, 0, w, h
        else:
            left = int(rng.integers(0, w // 4))
            top = int(rng.integers(0, h // 4))
            cw = int(rng.integers(max(2, w // 2), w - left))
            ch = int(rng.integers(max(2, h // 2), h - top))
            rect = vc.VRect(left, top, left + cw, top + ch)
        ow = int(rng.integers(16, 160))
        oh = int(rng.integers(16, 160))
        if not nv_plan_supported(h, w, left, cw, ch, oh, ow, top):
            continue
        if ran >= 5:
            break
        ran += 1
        bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        nv = bgr2nv21_numpy(bgr).reshape(h * 3 // 2, w)
        got = np.asarray(preprocess_fused_nv_batch(
            nv[None], rect, (ow, oh), precise=True
        ))[0]
        dec = vc.cvt_color(nv, ColorCode.COLOR_YUV2BGR_NV21)
        want = _jnp_chain(dec.data, rect, (ow, oh))
        c = cosine_similarity(got, want)
        assert abs(c - 1) < 1e-5, (h, w, rect, (ow, oh), c)
    assert ran >= 3

def test_fuzz_nv_runtime_tops():
    """Round-4 lift: random runtime crop tops through the NV kernel vs
    the equivalent static-top call (must agree exactly) and the
    decode+chain reference."""
    from vacv_tpu.core.types import ColorCode
    from vacv_tpu.ops.pallas.preprocess import (
        nv_plan_supported, preprocess_fused_nv_batch,
    )
    from vacv_tpu.utils.io import bgr2nv21_numpy

    rng = np.random.default_rng(4242)
    ran = 0
    for _ in range(80):
        h = int(rng.integers(10, 45)) * 8
        w = int(rng.integers(40, 200)) * 2
        left = int(rng.integers(0, w // 8))
        cw = int(rng.integers(max(2, w // 2), w - left))
        ch = int(rng.integers(max(2, h // 2), h * 3 // 4))
        ow = int(rng.integers(16, 128))
        oh = int(rng.integers(16, 128))
        if not nv_plan_supported(h, w, left, cw, ch, oh, ow, top=None):
            continue
        if ran >= 4:
            break
        ran += 1
        bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        nv = bgr2nv21_numpy(bgr).reshape(h * 3 // 2, w)
        rect0 = vc.VRect(left, 0, left + cw, ch)
        for top in sorted(set(int(t) for t in rng.integers(0, h - ch + 1, 3))):
            got = np.asarray(preprocess_fused_nv_batch(
                nv[None], rect0, (ow, oh), top=np.int32(top), precise=True
            ))[0]
            rect = vc.VRect(left, top, left + cw, top + ch)
            want = np.asarray(preprocess_fused_nv_batch(
                nv[None], rect, (ow, oh), precise=True
            ))[0]
            np.testing.assert_allclose(got, want, atol=1e-6,
                                       err_msg=str((h, w, rect, (ow, oh))))
            dec = vc.cvt_color(nv, ColorCode.COLOR_YUV2BGR_NV21)
            ref = _jnp_chain(dec.data, rect, (ow, oh))
            c = cosine_similarity(got, ref)
            assert abs(c - 1) < 1e-5, (h, w, rect, (ow, oh), c)
    assert ran >= 2
