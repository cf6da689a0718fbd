"""Pallas NV12/NV21 → BGR kernel.

TPU redesign of ``CvtColor::nv_to_bgr_neon`` (reference
``/root/reference/src/cv/cvt_color.cpp:184-494``).  The NEON version
burns most of its 300 lines on register-level deinterleave and a
3-stage ``vtrn`` transpose network to repack interleaved BGR pixels.
On TPU we keep channels planar and map the 2×2 chroma upsample onto
the hardware's two vector axes:

* **lanes** (width): the interleaved VU row [V0 U0 V1 U1 …] is spread
  to per-pixel V/U with a lane roll + parity select — V_full =
  select(even_lane, vu, roll(vu, 1)), U_full = select(even_lane,
  roll(vu, -1), vu).  This replaces the NEON ``vld2``/``vtrn`` dance
  and, unlike a broadcast-reshape, is a layout-preserving op Mosaic
  lowers natively (its reshape inference rejects lane interleaves).
* **sublanes** (height): the 2× row repeat of the chroma adders is a
  0/1 replication matmul ``Rep[r, r//2] = 1`` on the MXU.  The adders
  are 9-bit integers, so a single DEFAULT bf16 pass is exact.  This
  keeps every block rank-2 — an earlier ``(t, 2, w)`` rank-3 layout
  put only 2 rows in each 32-sublane u8 tile and ran ~6× slower.

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
    vu = vu_ref[:].astype(jnp.int32)  # (t, w) interleaved chroma pairs
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

    # Q7 coefficients (cvt_color.cpp:76-78); adders fit in 9 bits.
    ra = (179 * v) >> 7
    ga = (44 * u + 91 * v) >> 7
    ba = (227 * u) >> 7

    # 2× vertical repeat as an exact bf16 MXU matmul with the static
    # 0/1 matrix Rep[r, r//2] = 1 (values are small integers).
    rr = jax.lax.broadcasted_iota(jnp.int32, (2 * t, t), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (2 * t, t), 1)
    rep = (rr // 2 == cc).astype(jnp.bfloat16)

    def up2(x):
        return jnp.dot(
            rep, x.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )

    y = y_ref[:].astype(jnp.int32).astype(jnp.float32)  # (2t, w)
    b = jnp.clip(y + up2(ba), 0, 255)
    g = jnp.clip(y - up2(ga), 0, 255)
    r = jnp.clip(y + up2(ra), 0, 255)
    # No direct f32->u8 cast on Mosaic; values are exact integers.
    b_ref[:] = b.astype(jnp.int32).astype(jnp.uint8)
    g_ref[:] = g.astype(jnp.int32).astype(jnp.uint8)
    r_ref[:] = r.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("is_nv12", "interpret"))
def _call(y_plane, vu_plane, *, is_nv12: bool, interpret: bool):
    h, w = y_plane.shape
    h2 = (h + 1) // 2  # chroma rows; ceil covers odd Y heights
    y2 = y_plane
    if h % 2:
        # One phantom Y row pairs the final odd row with the last
        # chroma row — the TPU form of the reference's zerobuf/writebuf
        # scratch-row trick (cvt_color.cpp:52-66).
        y2 = jnp.pad(y2, ((0, 1), (0, 0)))
    if vu_plane.shape[0] < h2:
        vu_plane = jnp.pad(
            vu_plane, ((0, h2 - vu_plane.shape[0]), (0, 0))
        )
    # Pallas masks partial last blocks natively, so a ragged grid needs
    # NO plane-wide pad (an earlier design padded the chroma rows to a
    # multiple of t, which materialized a copy of the whole Y plane —
    # e.g. 1080p h2=540 → 640 copied Y to 1280 rows, ~30% of the
    # kernel's wall time).  Block rule: sublane dim divisible by 8 or
    # equal to the array dim — t=128 (and 2t=256) satisfies it; small
    # frames use t=h2 (the full array).
    t = min(128, h2)
    grid = (pl.cdiv(h2, t),)
    out_shape = jax.ShapeDtypeStruct((2 * h2, w), jnp.uint8)
    kernel = functools.partial(_kernel, is_nv12=is_nv12)
    b, g, r = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * t, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * t, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[out_shape] * 3,
        interpret=interpret,
    )(y2, vu_plane)
    if 2 * h2 != h:
        return b[:h], g[:h], r[:h]
    return b, g, r


def nv_to_bgr_pallas(y_plane, vu_plane, *, is_nv12: bool):
    """(b, g, r) u8 planes from Y (h,w) + interleaved VU (h/2, w)."""
    config.record_kernel("yuv2bgr")
    return _call(
        y_plane, vu_plane, is_nv12=is_nv12, interpret=config.pallas_interpret()
    )
