"""End-to-end Preprocessor configs (the BASELINE.json config shapes)."""
import cv2
import numpy as np

import vacv_tpu as vc
from vacv_tpu.models import PreprocessConfig, Preprocessor
from vacv_tpu.utils.compare import cosine_similarity
from vacv_tpu.utils.io import bgr2nv21_numpy


def test_config4_fused_normalize_pipeline(bgr_640x360):
    # crop -> resize -> chw -> fp32 -> normalize
    cfg = PreprocessConfig(
        crop_rect=vc.VRect(40, 20, 600, 340),
        out_size=(224, 224),
        out_layout=vc.CHW,
        normalize=True,
    )
    out = np.asarray(Preprocessor(cfg)(bgr_640x360))
    assert out.shape == (3, 224, 224)

    crop_ref = bgr_640x360[20:340, 40:600]
    resized = cv2.resize(crop_ref, (224, 224)).astype(np.float32)
    m, s = cv2.meanStdDev(resized)
    ref = (resized - m.ravel().astype(np.float32)) / (
        s.ravel().astype(np.float32) + 1e-6
    )
    ref = np.transpose(ref, (2, 0, 1))
    assert abs(cosine_similarity(out, ref) - 1) < 1e-4


def test_config2_yuv_pipeline(bgr_176x144):
    # yuv2bgr -> fp32 -> chw (BASELINE config 2)
    h, w, _ = bgr_176x144.shape
    nv = bgr2nv21_numpy(bgr_176x144).reshape(h * 3 // 2, w)
    cfg = PreprocessConfig(
        color_code=vc.COLOR_YUV2BGR_NV21,
        out_size=None,
        out_layout=vc.CHW,
        normalize=False,
    )
    out = np.asarray(Preprocessor(cfg)(nv))
    assert out.shape == (3, h, w)
    assert out.dtype == np.float32
    # chroma-subsampled roundtrip vs original
    hwc = np.transpose(out, (1, 2, 0))
    assert abs(cosine_similarity(hwc, bgr_176x144.astype(np.float32)) - 1) < 5e-4


def test_imagenet_style_mean_std(bgr_640x360):
    cfg = PreprocessConfig(
        out_size=(224, 224),
        mean=(104.0, 117.0, 123.0),
        stddev=(57.0, 57.0, 58.0),
    )
    out = np.asarray(Preprocessor(cfg)(bgr_640x360))
    assert out.shape == (3, 224, 224)


def test_profile_runner_smoke(bgr_176x144, capsys):
    from vacv_tpu.profile import CvProfile, TestFuncInfo

    def t():
        return [1.0, 0.5, 1.0, 1.0]

    prof = CvProfile(k_test_times=4, k_log_batch_size=2)
    prof.profile([TestFuncInfo("smoke", t)])
    assert prof.print_results()
    import tempfile, json, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "r.json")
        prof.save_results(p)
        data = json.load(open(p))
        assert data[0]["name"] == "smoke" and data[0]["passed"]


def test_config5_warp_pipeline(bgr_640x360):
    # warp_affine + full pipeline (BASELINE config 5)
    m = ((0.9, 0.05, 10.0), (-0.05, 0.9, 8.0))
    cfg = PreprocessConfig(
        warp=(m, (320, 240)),
        out_size=(128, 128),
        out_layout=vc.CHW,
        normalize=True,
    )
    out = np.asarray(Preprocessor(cfg)(bgr_640x360))
    assert out.shape == (3, 128, 128)

    warped = cv2.warpAffine(bgr_640x360, np.asarray(m, np.float64), (320, 240))
    resized = cv2.resize(warped, (128, 128)).astype(np.float32)
    mm, ss = cv2.meanStdDev(resized)
    ref = (resized - mm.ravel().astype(np.float32)) / (
        ss.ravel().astype(np.float32) + 1e-6
    )
    ref = np.transpose(ref, (2, 0, 1))
    assert abs(cosine_similarity(out, ref) - 1) < 2e-4


def test_stream_map_matches_per_frame(rng):
    """stream_map yields ordered, per-frame-identical results while
    keeping several device computations in flight."""
    import jax.numpy as jnp

    import vacv_tpu as vc
    from vacv_tpu.models import PreprocessConfig, Preprocessor
    from vacv_tpu.models.serving import StreamExecutor, stream_map

    cfg = PreprocessConfig(out_size=(64, 64))
    pre = Preprocessor(cfg)
    frames = [
        jnp.asarray(rng.integers(0, 256, (96, 128, 3), dtype=np.uint8))
        for _ in range(7)
    ]
    got = [np.asarray(o) for o in stream_map(pre.fn, frames, depth=3)]
    want = [np.asarray(pre.fn(f)) for f in frames]
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, atol=1e-5)

    ex = StreamExecutor(pre.fn, depth=2)
    outs = []
    for f in frames:
        r = ex.submit(f)
        if r is not None:
            outs.append(np.asarray(r))
    outs.extend(np.asarray(r) for r in ex.drain())
    assert len(outs) == len(frames)
    for a, b in zip(outs, want):
        np.testing.assert_allclose(a, b, atol=1e-5)
