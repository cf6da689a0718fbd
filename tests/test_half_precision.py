"""Half-precision (f16/bf16) support — the capability ceiling the
reference sketched in its graveyard fp16 resize
(src_deprecated/paddle-resize/cubic_resize_float16.cpp)."""
import jax.numpy as jnp
import numpy as np
import pytest

import vacv_tpu as vc
from vacv_tpu.utils.compare import cosine_similarity


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
def test_change_dtype_half(bgr_176x144, dtype):
    half = vc.change_dtype(bgr_176x144, dtype)
    assert half.dtype == dtype
    # u8 values are exactly representable in both half formats... f16
    # yes (<=255 integers exact); bf16 only up to 256 with 8-bit
    # mantissa — 255 rounds. Allow 1 LSB.
    back = vc.change_dtype(half, jnp.uint8)
    diff = np.abs(back.numpy().astype(int) - bgr_176x144.astype(int))
    assert diff.max() <= 1


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
def test_resize_half(bgr_176x144, dtype):
    src = bgr_176x144.astype(np.float32)
    ref = vc.resize(src, (96, 80)).numpy()
    out = vc.resize(vc.change_dtype(src, dtype), (96, 80))
    assert out.dtype == dtype
    assert abs(cosine_similarity(out.numpy().astype(np.float32), ref) - 1) < 1e-3


def test_warp_half(bgr_176x144):
    m = np.array([[0.9, 0.0, 4.0], [0.0, 0.9, 3.0]], np.float32)
    src = bgr_176x144.astype(np.float32)
    ref = vc.warp_affine(src, m, (96, 80)).numpy()
    out = vc.warp_affine(vc.change_dtype(src, jnp.bfloat16), m, (96, 80))
    assert out.dtype == jnp.bfloat16
    assert abs(cosine_similarity(out.numpy().astype(np.float32), ref) - 1) < 1e-3


def test_layout_half(bgr_176x144):
    half = vc.change_dtype(bgr_176x144, jnp.float16)
    chw = vc.change_layout(half, vc.CHW)
    assert chw.dtype == jnp.float16
    assert chw.shape == (3, 144, 176)
