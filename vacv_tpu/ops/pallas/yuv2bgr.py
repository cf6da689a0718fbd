"""Pallas NV12/NV21 → BGR kernel.

TPU redesign of ``CvtColor::nv_to_bgr_neon`` (reference
``/root/reference/src/cv/cvt_color.cpp:184-494``).  The NEON version
burns most of its 300 lines on register-level deinterleave and a
3-stage ``vtrn`` transpose network to repack interleaved BGR pixels.
On TPU we keep everything planar, so the kernel reduces to its actual
math: Q7 integer YUV→BGR at quarter resolution, a 2×2 broadcast
upsample, and three saturating adds against the Y plane — all on the
8×128 VPU, one grid step per row-tile.

The chroma plane arrives pre-deinterleaved (V and U as (H/2, W/2)
planes — the strided deinterleave is done by XLA outside the kernel,
where it fuses with the NV buffer slicing).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config


def _upsample2_in_kernel(x):
    """(t, w2) -> (2t, 2*w2) 2×2 nearest upsample."""
    t, w2 = x.shape
    x = jnp.broadcast_to(x[:, None, :, None], (t, 2, w2, 2))
    return x.reshape(2 * t, 2 * w2)


def _kernel(y_ref, v_ref, u_ref, b_ref, g_ref, r_ref):
    v = v_ref[:].astype(jnp.int32) - 128
    u = u_ref[:].astype(jnp.int32) - 128

    # Q7 coefficients (cvt_color.cpp:76-78); arithmetic shift == C's
    # signed >> on the negative intermediates.
    ra = (179 * v) >> 7
    ga = (44 * u + 91 * v) >> 7
    ba = (227 * u) >> 7

    ra = _upsample2_in_kernel(ra)
    ga = _upsample2_in_kernel(ga)
    ba = _upsample2_in_kernel(ba)

    y = y_ref[:].astype(jnp.int32)
    b_ref[:] = jnp.clip(y + ba, 0, 255).astype(jnp.uint8)
    g_ref[:] = jnp.clip(y - ga, 0, 255).astype(jnp.uint8)
    r_ref[:] = jnp.clip(y + ra, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(y_plane, v_s, u_s, *, interpret: bool):
    h, w = y_plane.shape
    h2, w2 = v_s.shape
    # Row-tile the chroma grid; 64 chroma rows -> 128 luma rows/step.
    t = min(64, h2)
    grid = (pl.cdiv(h2, t),)
    out_shape = jax.ShapeDtypeStruct((h, w), jnp.uint8)
    b, g, r = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * t, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * t, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[out_shape] * 3,
        interpret=interpret,
    )(y_plane, v_s, u_s)
    return b, g, r


def nv_to_bgr_pallas(y_plane, vu_plane, *, is_nv12: bool):
    """(b, g, r) u8 planes from Y (h,w) + interleaved VU (h/2, w)."""
    if is_nv12:
        u_s, v_s = vu_plane[:, 0::2], vu_plane[:, 1::2]
    else:
        v_s, u_s = vu_plane[:, 0::2], vu_plane[:, 1::2]
    return _call(y_plane, v_s, u_s, interpret=config.pallas_interpret())
