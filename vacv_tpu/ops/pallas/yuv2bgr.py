"""Pallas NV12/NV21 → BGR kernel.

TPU redesign of ``CvtColor::nv_to_bgr_neon`` (reference
``/root/reference/src/cv/cvt_color.cpp:184-494``).  The NEON version
burns most of its 300 lines on register-level deinterleave and a
3-stage ``vtrn`` transpose network to repack interleaved BGR pixels.
On TPU we keep channels planar, and the 2×2 chroma upsample maps onto
the vector unit without any reshape:

* **lanes** (width): the interleaved VU row [V0 U0 V1 U1 …] is spread
  to per-pixel V/U with a lane roll + parity select — V_full =
  select(even_lane, vu, roll(vu, 1)), U_full = select(even_lane,
  roll(vu, -1), vu).  This replaces the NEON ``vld2``/``vtrn`` dance
  and, unlike a broadcast-reshape, is a layout-preserving op Mosaic
  lowers natively (its reshape inference rejects lane interleaves).
* **sublanes** (height): the luma block arrives pre-viewed as
  ``(t, 2, w)`` — a free row-major view of ``(2t, w)`` done by XLA
  outside the kernel — so the two luma rows sharing a chroma row are
  indexed statically instead of with strided sublane access.

Q7 integer math per ``nv_to_bgr_naive`` (cvt_color.cpp:76-94); the
arithmetic ``>> 7`` on negative intermediates matches C's signed shift.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config


def _kernel(y_ref, vu_ref, b_ref, g_ref, r_ref, *, is_nv12: bool):
    vu = vu_ref[:].astype(jnp.int32)  # (t, w) interleaved pairs
    t, w = vu.shape

    even = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1) % 2 == 0
    first = vu                       # value at the pair's even lane
    second = pltpu.roll(vu, 1, 1)    # even lane's value seen from odd lane
    # roll takes non-negative shifts only: left-by-1 == right-by-(w-1)
    prev = pltpu.roll(vu, w - 1, 1)  # odd lane's value seen from even lane
    a_full = jnp.where(even, first, second)   # pair's lane-0 byte, spread
    b_full = jnp.where(even, prev, first)     # pair's lane-1 byte, spread
    if is_nv12:
        u, v = a_full - 128, b_full - 128
    else:
        v, u = a_full - 128, b_full - 128

    # Q7 coefficients (cvt_color.cpp:76-78)
    ra = (179 * v) >> 7
    ga = (44 * u + 91 * v) >> 7
    ba = (227 * u) >> 7

    for p in (0, 1):  # the two luma rows sharing this chroma row
        y = y_ref[:, p, :].astype(jnp.int32)
        b_ref[:, p, :] = jnp.clip(y + ba, 0, 255).astype(jnp.uint8)
        g_ref[:, p, :] = jnp.clip(y - ga, 0, 255).astype(jnp.uint8)
        r_ref[:, p, :] = jnp.clip(y + ra, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("is_nv12", "interpret"))
def _call(y_plane, vu_plane, *, is_nv12: bool, interpret: bool):
    h, w = y_plane.shape
    h2 = h // 2
    t = min(128, h2)
    # Mosaic cannot mask a partial (t, 2, w) rank-3 block, so the grid
    # must divide evenly: pad the chroma-row axis up to a multiple of t
    # (XLA fuses the pad into the relayout; garbage rows are sliced off
    # after the kernel).
    h2p = pl.cdiv(h2, t) * t
    y3 = y_plane.reshape(h2, 2, w)  # free row-major view
    vu = vu_plane
    if h2p != h2:
        y3 = jnp.pad(y3, ((0, h2p - h2), (0, 0), (0, 0)))
        vu = jnp.pad(vu, ((0, h2p - h2), (0, 0)))
    grid = (h2p // t,)
    out_shape = jax.ShapeDtypeStruct((h2p, 2, w), jnp.uint8)
    kernel = functools.partial(_kernel, is_nv12=is_nv12)
    b, g, r = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, 2, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, 2, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[out_shape] * 3,
        interpret=interpret,
    )(y3, vu)
    return (
        b[:h2].reshape(h, w),
        g[:h2].reshape(h, w),
        r[:h2].reshape(h, w),
    )


def nv_to_bgr_pallas(y_plane, vu_plane, *, is_nv12: bool):
    """(b, g, r) u8 planes from Y (h,w) + interleaved VU (h/2, w)."""
    return _call(
        y_plane, vu_plane, is_nv12=is_nv12, interpret=config.pallas_interpret()
    )
