"""Pallas affine-warp kernel — exact bilinear, gather-free.

The jnp warp (``ops/warp_affine.py``) is exact but gather-bound: XLA's
per-element 2D gather runs at ~1 element/cycle (~56 Mpx/s measured at
1440p — 16 ms/frame).  This kernel removes the gather entirely, per the
SURVEY §7 "hard parts" plan (tiled inverse mapping with per-tile
bounding-box loads):

For an output tile of T rows × L lanes, the inverse map is linear, so
all source samples live in a band of ``BH × BW`` source pixels whose
static size follows from the matrix coefficients.  Within the band:

* **horizontal sampling is a matmul**: for each tile row, the 2-tap
  bilinear x-weights form a banded ``(BW, L)`` matrix built *in
  closed form* from an iota comparison (``cc == sx`` picks the taps) —
  no gather, and the (BH, BW) @ (BW, L) product runs on the MXU;
* **vertical sampling is a masked reduction** over the BH band rows on
  the VPU (``sy`` relative to the band start selects each row's
  contribution).

Border handling matches the jnp op's OpenCV mode: per-tap validity
zeroes the tap's weight, and the weight deficit is backfilled with the
border value.  The u8 path uses the same Q11-quantized weights as the
reference fixed-point kernel (warp_affine_naive.cpp:31-41) with Q22
truncation on write-out.

Two source-residency modes:

* **resident** (small planes): the padded source planes sit whole in
  VMEM across the tile grid — one HBM read of the source total.
* **streaming** (large planes, e.g. the reference's 2560×1440 f32
  asset whose 14 MB/plane blew the old whole-plane gate): the source
  stays in HBM; at the first tile of every output tile-row the kernel
  DMAs the source *row band* feeding that whole tile-row into a VMEM
  scratch (its height is closed-form from the matrix coefficients),
  and every tile in the row slices its column window out of the band.
  HBM traffic ≈ one source read × a small overlap factor, independent
  of plane size.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config

_COEF_SCALE = 2048.0

# VMEM budget for keeping the source planes resident (bytes); larger
# sources use the streaming row-band mode.
_PLANE_BUDGET = 8 * 1024 * 1024
# VMEM budget for the streaming row-band scratch (bytes).
_BAND_BUDGET = 6 * 1024 * 1024


def _quantize_q11(w):
    return jnp.floor(w * _COEF_SCALE + 0.5) / _COEF_SCALE


def _kernel(src_ref, out_ref, *scratch, m, h_in, w_in, t, l, bh, bw, rh, cw,
            u8, bv, cs, rbh):
    stream = rbh > 0
    ty = pl.program_id(1)
    tx = pl.program_id(2)

    # All per-pixel coordinate/weight math runs in the flattened
    # (1, t*l) layout — lane j' = trow*l + j — so the selection fields
    # below need no concatenation (Mosaic cannot concat offset-layout
    # row slices) and per-row views are 128-aligned static lane slices.
    jc = jax.lax.broadcasted_iota(jnp.int32, (1, t * l), 1)
    dy = (ty * t + jc // l).astype(jnp.float32)
    dx = (tx * l + (jc % l)).astype(jnp.float32)
    m0, m1, m2, m3, m4, m5 = (jnp.float32(v) for v in m)
    fx = jnp.clip(m0 * dx + m1 * dy + m2, -1e6, 1e6)
    fy = jnp.clip(m3 * dx + m4 * dy + m5, -1e6, 1e6)

    # Derive the fractional weights from the *integer* coordinates, not
    # from a separate floor: XLA may materialize fx/fy twice with
    # different FMA contraction, and an inconsistent (sy, ay) pair
    # around integer boundaries selects the wrong source row outright.
    # Anchoring ay to sy keeps the pair self-consistent to 1 ulp.
    sx = jnp.floor(fx).astype(jnp.int32)
    sy = jnp.floor(fy).astype(jnp.int32)
    ax = jnp.clip(fx - sx.astype(jnp.float32), 0.0, 1.0)
    ay = jnp.clip(fy - sy.astype(jnp.float32), 0.0, 1.0)

    if u8:
        wx0 = _quantize_q11(1.0 - ax)
        wx1 = 1.0 - wx0
        wy0 = _quantize_q11(1.0 - ay)
        wy1 = 1.0 - wy0
    else:
        wx0, wx1 = 1.0 - ax, ax
        wy0, wy1 = 1.0 - ay, ay

    # Per-tap image-bounds validity (OpenCV BORDER_CONSTANT semantics).
    x0_ok = ((sx >= 0) & (sx <= w_in - 1)).astype(jnp.float32)
    x1_ok = ((sx >= -1) & (sx + 1 <= w_in - 1)).astype(jnp.float32)
    y0_ok = ((sy >= 0) & (sy <= h_in - 1)).astype(jnp.float32)
    y1_ok = ((sy >= -1) & (sy + 1 <= h_in - 1)).astype(jnp.float32)

    if stream:
        # Streaming mode runs on unpadded sources gated to h%8 == 0,
        # w%128 == 0, so the "padded" dims ARE the source dims.
        h_pad, w_pad = h_in, w_in
        band_ref, sem = scratch
        row_align = 8

        # Row band feeding this whole output tile-row: closed-form
        # from the 4 corners of the (t, ntx*l) row (fy is affine, so
        # the corner minimum is the row minimum).
        wp_out = pl.num_programs(2) * l
        cor = [
            m3 * ddx + m4 * ddy + m5
            for ddx in (0.0, float(wp_out - 1))
            for ddy in ((ty * t).astype(jnp.float32),
                        (ty * t + (t - 1)).astype(jnp.float32))
        ]
        row_min = jnp.floor(
            jnp.minimum(jnp.minimum(cor[0], cor[1]),
                        jnp.minimum(cor[2], cor[3]))
        ).astype(jnp.int32)
        r0_row = jnp.minimum(
            (jnp.clip(row_min, 0, None) // 8) * 8, h_in - rbh
        )
        r0_row = pl.multiple_of(r0_row, 8)

        @pl.when(tx == 0)
        def _():
            cg = pl.program_id(0)
            for k in range(cs):
                pltpu.make_async_copy(
                    src_ref.at[cg * cs + k, pl.ds(r0_row, rbh), :],
                    band_ref.at[k],
                    sem.at[k],
                ).start()
            for k in range(cs):
                pltpu.make_async_copy(
                    src_ref.at[cg * cs + k, pl.ds(r0_row, rbh), :],
                    band_ref.at[k],
                    sem.at[k],
                ).wait()
    else:
        h_pad = src_ref.shape[1]
        w_pad = src_ref.shape[2]
        row_align = 32

    # Band origin: tile minima aligned down to the VMEM slice
    # granularity (8 sublane rows suffice for the dynamic slices; the
    # resident mode keeps its original 32 alignment), clipped so the
    # static band sizes stay in-bounds.
    r0 = jnp.minimum(
        (jnp.clip(jnp.min(sy), 0, None) // row_align) * row_align,
        h_pad - bh,
    )
    c0 = jnp.minimum(
        (jnp.clip(jnp.min(sx), 0, None) // 128) * 128, w_pad - bw
    )
    r0 = pl.multiple_of(r0, 8)
    c0 = pl.multiple_of(c0, 128)

    def load_band(row_start, nrows):
        # All cs channels stacked along the row (M) axis: the selection
        # dots then run at M = cs*rh, and the coordinate/selection
        # fields are built once for every channel.
        def one(ci):
            if stream:
                # row_start and r0_row are both 8-aligned by
                # construction; the hint survives the min/clip chains
                # Mosaic's divisibility analysis loses.
                off = pl.multiple_of(row_start - r0_row, 8)
                b = band_ref[ci, pl.ds(off, nrows), pl.ds(c0, bw)]
            else:
                b = src_ref[ci, pl.ds(row_start, nrows), pl.ds(c0, bw)]
            return (
                b.astype(jnp.int32).astype(jnp.float32)
                if u8
                else b.astype(jnp.float32)
            )

        if cs == 1:
            return one(0)
        return jnp.concatenate([one(ci) for ci in range(cs)], axis=0)

    # Second-level column narrowing: the tile's x taps span only
    # ~|m0|*l + |m1|*t columns; c0 is 128-aligned so up to 127 of the
    # loaded bw columns are slack.  A dynamic lane-rotate shifts the
    # true tap start c1 to column 0, after which the static cw (<= bw)
    # window covers every tap — shrinking both selection fields and
    # both dots by bw/cw.  (c1 - c0 is in [0, bw - cw] by construction,
    # so no real tap wraps out of the window.)
    if cw < bw:
        c1 = jnp.minimum(jnp.clip(jnp.min(sx), 0, None), w_pad - cw)
    else:
        c1 = c0  # window not narrowed; no roll
    roll_amt = c1 - c0
    sx_rel = sx - c1  # (1, t*l)
    sy_rel = sy - r0

    wsum = (wx0 * x0_ok + wx1 * x1_ok) * (wy0 * y0_ok + wy1 * y1_ok)
    border = jnp.float32(bv)

    # The tile's vertical taps span only ~|m3|*l + |m4|*t source rows —
    # a small slice of the (alignment-padded) band.  sy is affine in
    # the output coords with bounded slopes, so the clipped minimum
    # plus the static rh always covers every valid tap.
    syc = jnp.clip(sy, 0, h_in - 1) - r0
    ry0 = jnp.clip(jnp.min(syc), 0, bh - rh)
    ry0 = pl.multiple_of((ry0 // 8) * 8, 8)
    band = load_band(r0 + ry0, rh)
    if cw < bw:
        band = pltpu.roll(band, (bw - roll_amt) % bw, 1)[:, :cw]

    # Horizontal sampling as 0/1 SELECTION matmuls: F[k, trow*l + j]
    # picks band column sx (F1: sx+1) of tile row trow, lane j — one
    # iota compare per tap for all t rows batched along N.  (F1 must
    # be its own compare, not a roll of F: for fx in (-1, 0) the sx
    # tap is out of band at column -1 while the sx+1 tap at column 0
    # is valid.)  Because F is 0/1 and the u8 band values are 8-bit
    # integers, a single DEFAULT bf16 MXU pass is exact; the Q11
    # interpolation weights are applied *after* the dot on the VPU at
    # full f32 precision, so the fixed-point reference arithmetic is
    # reproduced bit-exactly without the ~6 passes of a
    # HIGHEST-precision matmul.  (For f32 inputs the selection dots
    # run at HIGHEST, which is exact for a 0/1 weight matrix.)
    cc = jax.lax.broadcasted_iota(jnp.int32, (cw, t * l), 0)
    fdt = jnp.bfloat16 if u8 else jnp.float32
    F = (cc == sx_rel).astype(fdt)
    F1 = (cc == sx_rel + 1).astype(fdt)
    if u8:
        bb = band.astype(jnp.bfloat16)
        p0cat = jnp.dot(bb, F, preferred_element_type=jnp.float32)
        p1cat = jnp.dot(bb, F1, preferred_element_type=jnp.float32)
    else:
        p0cat = jnp.dot(
            band, F, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        p1cat = jnp.dot(
            band, F1, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    wx0v = wx0 * x0_ok  # (1, t*l)
    wx1v = wx1 * x1_ok
    wy0v = wy0 * y0_ok
    wy1v = wy1 * y1_ok
    backfill = (1.0 - wsum) * border

    # Vertical 2-tap select as a single iota-compare weight field over
    # the full (rh, t*l) block — shared by every channel; the whole
    # vertical pass is one VPU multiply+reduce per channel, no per-row
    # loop.
    dd = jax.lax.broadcasted_iota(jnp.int32, (rh, t * l), 0) + ry0
    wv = jnp.where(dd == sy_rel, wy0v, 0.0) + jnp.where(
        dd == sy_rel + 1, wy1v, 0.0
    )

    for ci in range(cs):
        rs = slice(ci * rh, (ci + 1) * rh)  # 8-aligned static row slice
        hrows = wx0v * p0cat[rs] + wx1v * p1cat[rs]
        acc = jnp.sum(wv * hrows, axis=0, keepdims=True) + backfill

        if u8:
            # Q22 truncation; no direct f32->u8 cast on Mosaic — via i32.
            acc = jnp.clip(jnp.floor(acc + 1e-4), 0, 255)
            acc = acc.astype(jnp.int32).astype(jnp.uint8)
        for trow in range(t):
            out_ref[ci, trow, :] = acc[0, trow * l : (trow + 1) * l]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _band_sizes(minv, t, l, h_pad, w_pad):
    """Static band sizes incl. the 32/128 origin-alignment slack, plus
    the per-output-row slice height rh (row sy span + tap + 8-align)."""
    m = np.abs(np.asarray(minv, np.float64)).ravel()
    row_span = int(np.ceil(m[3] * (l - 1) + m[4] * (t - 1)))
    col_span = int(np.ceil(m[0] * (l - 1) + m[1] * (t - 1)))
    bh = min(_round_up(row_span + 3 + 32, 32), h_pad)
    bw = min(_round_up(col_span + 3 + 128, 128), w_pad)
    rh = min(_round_up(row_span + 10, 8), bh)
    cw = min(_round_up(col_span + 3, 128), bw)
    return bh, bw, rh, cw


def _row_band_height(minv, t, l, w_out, h_in, bh):
    """Streaming-mode row-band height: the source rows feeding one full
    (t, w_out_pad) output tile-row, plus the per-tile band height so
    every tile's [r0, r0+bh) window is contained (see containment
    analysis in _call)."""
    m = np.abs(np.asarray(minv, np.float64)).ravel()
    wp = _round_up(w_out, l)
    row_span = int(np.ceil(m[3] * (wp - 1)))
    return min(_round_up(row_span + 3 + 8, 8) + bh, h_in)


def _stream_ok(minv, h_in, w_in, w_out, itemsize):
    """Is the streaming row-band mode available for this config?"""
    if h_in % 8 or w_in % 128:
        return False
    t, l = 8, 128
    bh, bw, rh, cw = _band_sizes(minv, t, l, h_in, w_in)
    rbh = _row_band_height(minv, t, l, w_out, h_in, bh)
    return rbh * w_in * itemsize <= _BAND_BUDGET


def warp_supported(minv, h_in, w_in, itemsize: int = 1,
                   w_out: int | None = None) -> bool:
    """Can the pallas kernel handle this warp config?"""
    t, l = 8, 128
    h_pad = _round_up(h_in, 32)
    w_pad = _round_up(w_in, 128)
    bh, bw, _, _ = _band_sizes(minv, t, l, h_pad, w_pad)
    # Matrix-magnitude gate, evaluated at the smallest tile height the
    # adaptive _call would fall back to: beyond these band sizes (huge
    # downscale factors / extreme shears) the selection fields F/F1
    # (cw, t*l) plus the band no longer fit a safe VMEM share even at
    # t=8, so the op routes to the jnp gather path instead.
    if not (bh <= 224 and bw <= 1152):
        return False
    if h_in * w_in * itemsize <= _PLANE_BUDGET:
        return True
    return _stream_ok(minv, h_in, w_in, w_out if w_out else w_in, itemsize)


@functools.partial(
    jax.jit,
    static_argnames=("m", "h_out", "w_out", "u8", "bv", "interpret"),
)
def _call(planes, *, m, h_out, w_out, u8, bv, interpret):
    c, h_in, w_in = planes.shape
    l = 128
    itemsize = 1 if u8 else 4
    stream = h_in * w_in * itemsize > _PLANE_BUDGET

    if stream:
        # Source stays in HBM, unpadded (gated to h%8 == 0, w%128 == 0
        # by warp_supported); per-tile-row bands DMA into VMEM scratch.
        h_pad, w_pad = h_in, w_in
    else:
        # Pad the plane so the maximal aligned band start stays
        # in-bounds.
        h_pad = _round_up(h_in, 32)
        w_pad = _round_up(w_in, 128)
        if (h_pad, w_pad) != (h_in, w_in):
            planes = jnp.pad(
                planes, ((0, 0), (0, h_pad - h_in), (0, w_pad - w_in))
            )

    # Tile height: taller tiles halve the grid-step count (per-step
    # overhead ~0.7 us) while growing the per-tile row band rh and the
    # selection-dot MACs.  Measured at 1080p u8: t=8 → 0.734 ms,
    # t=16 → 0.678, t=32 → 0.677 — prefer 16, shed to 8 when its
    # VMEM working set doesn't fit (large bands), then 32.
    for t in (16, 8, 32):
        bh, bw, rh, cw = _band_sizes(m, t, l, h_pad, w_pad)
        if stream:
            rbh = _row_band_height(m, t, l, w_out, h_in, bh)
            cs = (
                c
                if c * rbh * w_pad * itemsize <= _BAND_BUDGET
                else 1
            )
            resident = cs * rbh * w_pad * itemsize
        else:
            rbh = 0
            # Channel stacking: when every plane fits VMEM together,
            # process all c channels per grid step with the bands
            # stacked along the dot's M axis — 3x fewer selection-field
            # builds and a taller, better-utilized MXU M dimension.
            cs = c if c * h_pad * w_pad * itemsize <= _PLANE_BUDGET else 1
            resident = c * h_pad * w_pad * itemsize
        work = (
            2 * cw * t * l * (2 if u8 else 4)  # F/F1 fields
            + 2 * cs * rh * t * l * 4  # p0cat/p1cat
            + rh * t * l * 4  # wv
            + cs * rh * bw * 4  # band
        )
        if work + resident <= 12 * 1024 * 1024:
            break
    hp = pl.cdiv(h_out, t) * t
    wp = pl.cdiv(w_out, l) * l
    grid = (c // cs, hp // t, wp // l)
    kernel = functools.partial(
        _kernel, m=m, h_in=h_in, w_in=w_in, t=t, l=l, bh=bh, bw=bw, rh=rh,
        cw=cw, u8=u8, bv=bv, cs=cs, rbh=rbh,
    )
    dtype = jnp.uint8 if u8 else jnp.float32
    if stream:
        in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)]
        scratch_shapes = [
            pltpu.VMEM((cs, rbh, w_pad), planes.dtype),
            pltpu.SemaphoreType.DMA((cs,)),
        ]
    else:
        in_specs = [
            pl.BlockSpec(
                (cs, h_pad, w_pad), lambda ci, ty, tx: (ci, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        scratch_shapes = []
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (cs, t, l), lambda ci, ty, tx: (ci, ty, tx),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(planes)
    return out[:, :h_out, :w_out]


def warp_affine_pallas(planes, minv, h_out: int, w_out: int, *, u8: bool,
                       border_value: float):
    """Warp (c, h, w) planes (u8 or f32) with inverse matrix ``minv``.

    Returns (c, h_out, w_out) in the input's dtype (u8 via Q22
    truncation).  Caller must have checked ``warp_supported``.
    """
    m = tuple(float(v) for v in np.asarray(minv, np.float32).ravel())
    config.record_kernel("warp_affine")
    return _call(
        planes, m=m, h_out=h_out, w_out=w_out, u8=u8,
        bv=float(border_value), interpret=config.pallas_interpret(),
    )
