"""Fused Pallas preprocess kernel: crop → bilinear resize → CHW f32 →
per-image normalize, in ONE pass over HBM.

This is the flagship kernel (BASELINE config 4, the headline bench).
The XLA pipeline already fuses the dtype widen and normalize into the
resize matmuls, but its first (dense) resize pass is MXU-bound:
``W_y (oh, ch) @ src (ch, W*3)`` costs ``oh*ch*W*3`` MACs while the
bilinear band structure only needs ~``2*oh*W*3`` (see the banding notes
in ``ops/resize.py`` — banding pass 1 under XLA breaks the u8 convert
fusion, so the jnp path leaves it dense).  Inside a kernel we control
the fusion, so both passes are banded:

* the frame streams HBM→VMEM once as u8 via double-buffered DMA in
  row chunks (the only read of the 6 MB frame);
* **vertical pass**: per chunk, a small ``(RW, CH) @ (CH, W*3)``
  matmul accumulates into the chunk's static output-row window of a
  VMEM-resident f32 accumulator — ~10× fewer MACs than dense;
* **horizontal pass** (on the frame's last chunk): banded matmuls on
  the *interleaved* lane axis — out lane ``o*3+c`` draws from src
  lanes ``(left+w)*3+c``, so each 128-lane output block touches a
  ``~128·scale`` source band and crop-left rides the weights;
* vacv u8 fixed-point parity truncation (``floor`` after the Q11
  matmuls, resize_naive.cpp:61-64), the HWC→CHW **deinterleave as 0/1
  selection matmuls** (``G[s, o] = (s == o*3+c)`` — exact in one bf16
  MXU pass on the ≤8-bit truncated values), the per-channel moments,
  and the ``(x−μ)/(σ+1e-6)`` scale all happen in VMEM; the kernel
  writes the final planar normalized (3, oh, ow) f32 block.  No XLA
  epilogue touches the output again (the previous interleaved+epilogue
  design cost an extra read+write of the whole output batch).

Matmuls run on the MXU in bf16.  ``precise=True`` splits both weights
and the horizontal operand into hi/lo bf16 pairs (Dekker-style), making
each pass exact to f32 accumulation — used by the CPU differential
tests; the fast path's plain bf16 matches the jnp pipeline's own
on-TPU numerics (default matmul precision is bf16) within the 1e-4
cosine bar.

Crop-top can be a *runtime* scalar (scalar-prefetched into the DMA row
offsets); everything else is static.  Callers fall back to the jnp
pipeline for configs the planner rejects (non-u8, non-HWC3, odd lane
widths, tiny crops, VMEM overflow).

Reference parity anchors: crop rect semantics crop.cpp:127-131;
bilinear Q11 weights resize_naive.cpp:20-53; normalize chain
normalize.cpp:84-120.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config
from ..resize import _cubic_weights, _linear_weights, _nearest_weights


def _resize_weights(n_in: int, n_out: int, interp: str) -> "np.ndarray":
    """Dense (n_out, n_in) resize weight matrix for the fused kernel.

    linear keeps the reference's Q11-quantized fixed-point grid
    (resize_naive.cpp:20-53); cubic (4-tap A=-0.75) and nearest reuse
    the resize op's builders unquantized, exactly like the standalone
    resize dispatcher (ops/resize.py:205-229) — the banded plan logic
    downstream is tap-count-agnostic (bands are scanned from the
    matrices' nonzero structure)."""
    if interp == "cubic":
        return _cubic_weights(n_in, n_out)
    if interp == "nearest":
        return _nearest_weights(n_in, n_out)
    return _linear_weights(n_in, n_out, quantize=True)

EPS = 1e-6

_LANE = 128
# Source rows per DMA chunk (u8 sublane tile = 32): the planner tries
# 128 first (large chunks amortise the ~1-2 us per-grid-step issue
# overhead; at 1080p a 128-row chunk is ~0.8 MB) and steps down for
# wide frames whose f32 accumulator eats the VMEM budget.
_VMEM_BUDGET = int(15.9 * 1024 * 1024)
# DMA pipeline depth (outstanding HBM->VMEM chunk copies).
_NBUF = 4


def _ceil_to(x: int, n: int) -> int:
    return -(-x // n) * n


def _split_hi_lo(w: np.ndarray):
    """Dekker split: w == hi + lo exactly, both bf16."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(np.float32)).astype(jnp.bfloat16)
    return np.stack([hi, lo])


@dataclass(frozen=True)
class _Plan:
    """Static planning product for one (shape, crop, out) config."""

    n_chunks: int
    chunk_rows: int      # CH
    row_win: int         # RW: out-row window per chunk (multiple of 8)
    starts: tuple        # (n_chunks,) src row start (crop-relative)
    out_row0: tuple      # (n_chunks,) out-row window start (mult of 8)
    op3: int             # padded interleaved out lanes (mult of 128)
    owp: int             # padded per-channel out lanes (mult of 128)
    n_xblocks: int
    xband: int           # BW: padded horizontal band (multiple of 128)
    xstarts: tuple       # (n_xblocks,) src lane band start (mult of 128)
    wy: np.ndarray       # (2, n_chunks, RW, CH) bf16 hi/lo
    wx: np.ndarray       # (2, n_xblocks, BW, 128) bf16 hi/lo
    vmem_bytes: int
    nbuf: int            # DMA pipeline depth (outstanding chunk copies)


@functools.lru_cache(maxsize=64)
def _plan(h_img: int, w_img: int, left: int, cw: int, ch: int,
          oh: int, ow: int, precise: bool = False,
          interp: str = "linear") -> _Plan | None:
    """Build the banded weight tables.  Returns None if unsupported.

    The DMA chunk height minimizes a measured cost model: every chunk
    re-reads up to 8 alignment rows and the clamped last chunk re-reads
    its overlap with the previous one, so a candidate costs
    ``n_chunks * (chunk + 8)`` DMA'd rows — plus ~48 rows' worth of
    per-grid-step overhead (~0.7 us/step measured on v5e, which is why
    minimum-traffic short chunks lose to taller ones).  Ties prefer
    taller chunks; VMEM-overflowing candidates (wide frames: the f32
    accumulator spans the full interleaved width) fall through to the
    next best, first shedding DMA pipeline depth (nbuf).
    """
    if ch <= 0:
        return None
    # Cost of a candidate: DMA'd rows nc*(chunk+8) plus a per-grid-step
    # penalty (measured ~0.7 us/step on v5e ≈ the DMA time of ~48 rows
    # at 1080p width — taller chunks beat minimum-traffic ones).
    # Chunk heights stay multiples of 8: the HBM row slice (chunk + 8
    # rows) must be aligned to the i8 (8, 128) tiling.  Shallow DMA
    # pipelines expose per-step copy latency (measured: nbuf=2 costs
    # ~28% at 1080p), so candidates are ranked with an nbuf-dependent
    # multiplier rather than preferring traffic alone.
    cands = sorted(
        (
            (chunk, nbuf)
            # +1: a single whole-crop chunk (chunk == ch) must stay a
            # candidate — crops of <= 224 rows can fit one chunk.
            for chunk in range(32, min(225, max(ch + 1, 33)), 8)
            for nbuf in (6, 4, 3, 2)
        ),
        key=lambda cn: (
            -(-ch // cn[0])
            * (cn[0] + 8 + 48)
            # Depth 6 measured 12-14% faster than depth 4 at 1080p in
            # interleaved A/B bench runs (round 3) — deeper pipelines
            # keep the DMA stream busy across the horizontal-pass
            # bubble at the frame boundary; shallow ones still pay the
            # measured latency penalty.
            * (1.0 + 0.15 * max(0, 4 - cn[1]) ** 2)
            / (1.06 if cn[1] >= 6 else 1.0),
            -cn[0],
        ),
    )
    for chunk, nbuf in cands:
        p = _plan_with_chunk(
            h_img, w_img, left, cw, ch, oh, ow, chunk, nbuf, precise,
            interp,
        )
        if p is not None:
            return p
    return None


def _vertical_plan(ch, oh, chunk, interp="linear"):
    """Chunked vertical Q11 weight tables, shared by the BGR and NV
    plans: (n_chunks, starts, out_row0, row_win, wy) where wy is
    (9, n_chunks, row_win, chunk+8) — chunks are DMA'd from an
    8-aligned base row, so the crop rows sit at a runtime shift
    rem = row0 - base ∈ [0, 8] inside a (CHUNK+8)-row buffer; the
    9 variants pre-shift the weight columns per rem and the
    scalar-prefetch index map picks the right one per step."""
    wy_full = _resize_weights(ch, oh, interp)  # (oh, ch)
    n_chunks = -(-ch // chunk)
    starts, slices = [], []
    prev_end = 0
    row_win = 8
    for j in range(n_chunks):
        s = min(j * chunk, ch - chunk)
        wyj = wy_full[:, s : s + chunk].copy()
        # Overlap with the previous chunk (clamped last chunk): zero
        # the already-covered columns so each weight lands exactly once.
        if s < prev_end:
            wyj[:, : prev_end - s] = 0.0
        prev_end = s + chunk
        nz = np.nonzero(wyj.any(axis=1))[0]
        r0 = 0 if len(nz) == 0 else (int(nz[0]) // 8) * 8
        r1 = r0 if len(nz) == 0 else int(nz[-1]) + 1
        row_win = max(row_win, _ceil_to(max(r1 - r0, 8), 8))
        starts.append(s)
        slices.append((wyj, r0))
    row_win = min(row_win, _ceil_to(oh, 8))
    out0 = []
    wy = np.zeros((9, n_chunks, row_win, chunk + 8), np.float32)
    ohp = _ceil_to(oh, 8)  # accumulator rows (padded for odd oh)
    for j, (wyj, r0) in enumerate(slices):
        # Clamp against the PADDED accumulator height: oh - row_win is
        # not 8-aligned for odd oh, and the kernel's multiple_of hint
        # on the window start must stay honest (a lying hint silently
        # corrupts on device while interpret passes).
        r0 = min(r0, max(ohp - row_win, 0))
        r1 = min(r0 + row_win, oh)
        out0.append(r0)
        if wyj[:r0].any() or wyj[r1:].any():
            return None  # window miss (cannot happen; belt-and-braces)
        for rem in range(9):
            wy[rem, j, : r1 - r0, rem : rem + chunk] = wyj[r0:r1]
    return n_chunks, starts, out0, row_win, wy


def _plan_with_chunk(h_img, w_img, left, cw, ch, oh, ow,
                     chunk, nbuf=_NBUF, precise=False,
                     interp="linear") -> _Plan | None:
    w3 = w_img * 3
    if left < 0 or cw <= 0 or ch <= 0 or left + cw > w_img or ch > h_img:
        return None         # crop must sit inside the frame
    if ch < chunk:          # tiny crops: jnp path (chunk would read
        return None         # past the crop for an unknown runtime top)
    if h_img % 8 or h_img < chunk + 8:
        # DMA row offsets must be 8-aligned (i8 HBM tiling); the
        # aligned-base + shifted-weight-variant trick needs H % 8 == 0.
        # Odd heights are handled by the wrapper (one-time row pad),
        # so only h_img < chunk + 8 rejects here in practice.
        return None
    # NOTE: w3 need not be a multiple of 128 — VMEM refs carry
    # implicit lane padding, so ragged-width DMA chunks and a ragged
    # accumulator lower fine (lifts the round-2 w*3 % 128 gate that
    # excluded the reference's own 176x144 / 284x214 assets).

    # ---- vertical: chunked Q11 bilinear rows ----------------------
    vert = _vertical_plan(ch, oh, chunk, interp)
    if vert is None:
        return None
    n_chunks, starts, out0, row_win, wy = vert

    # ---- horizontal: banded Q11 bilinear over interleaved lanes ---
    wx_full = _resize_weights(cw, ow, interp)  # (ow, cw)
    op3 = _ceil_to(ow * 3, _LANE)
    n_xblocks = op3 // _LANE
    taps = [np.nonzero(wx_full[o])[0] for o in range(ow)]
    raw, xband = [], _LANE
    for b in range(n_xblocks):
        lanes = np.arange(b * _LANE, (b + 1) * _LANE)
        src_lanes = [
            (left + t) * 3 + (ln % 3)
            for ln in lanes if ln < ow * 3
            for t in taps[ln // 3]
        ]
        if not src_lanes:   # block is pure lane padding
            raw.append(None)
            continue
        c0 = (min(src_lanes) // _LANE) * _LANE
        c1 = max(src_lanes) + 1
        raw.append((c0, c1))
        xband = max(xband, _ceil_to(c1 - c0, _LANE))
    if xband > w3:
        return None
    # Grow the band so w3 - xband is 128-aligned: slid starts
    # (c0 = w3 - xband) then stay lane-aligned with coverage to the
    # row end (ragged-width frames would otherwise need an unaligned
    # accumulator slice, which relayouts).
    xband += (w3 - xband) % _LANE
    xstarts = []
    wx = np.zeros((n_xblocks, xband, _LANE), np.float32)
    for b in range(n_xblocks):
        if raw[b] is None:
            xstarts.append(0)
            continue
        # The band is uniform (= the widest block's); slide the start
        # down so it never pokes past the row end (w3 - xband is
        # 128-aligned by construction above).
        c0 = min(raw[b][0], w3 - xband)
        xstarts.append(c0)
        for i in range(_LANE):
            ln = b * _LANE + i
            if ln >= ow * 3:
                continue
            o, c = ln // 3, ln % 3
            for t in taps[o]:
                wx[b, (left + t) * 3 + c - c0, i] = wx_full[o, t]

    rows = chunk + 8
    owp = _ceil_to(ow, _LANE)
    w3p = _ceil_to(w3, _LANE)  # implicit VMEM lane padding
    wx_hl = _split_hi_lo(wx)
    vmem = (
        oh * w3p * 4                     # f32 accumulator
        + nbuf * rows * w3p              # pipelined u8 chunk buffers
        + rows * w3p * 4                 # widen temporaries (i16+bf16)
        # wy block (+pipeline copy); the precise path streams both the
        # hi and lo Dekker halves, doubling the block.
        + row_win * rows * 2 * 2 * (2 if precise else 1)
        # wx bands (bf16): hi half only unless precise loads hi + lo.
        + wx_hl.nbytes // (1 if precise else 2)
        + oh * op3 * 4                   # interleaved-result scratch
        + 3 * oh * owp * 4               # planar out block
        + oh * xband * 4                 # horizontal operand split temp
        + op3 * _LANE * 10               # blocked deinterleave field
    )
    if vmem > _VMEM_BUDGET:
        return None
    return _Plan(
        n_chunks, chunk, row_win, tuple(starts), tuple(out0),
        op3, owp, n_xblocks, xband, tuple(xstarts),
        _split_hi_lo(wy), wx_hl, vmem, nbuf,
    )


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    # scalar prefetch
    top_ref, starts_ref, out0_ref,
    # inputs
    src_hbm, wy_ref, wx_ref,
    # outputs
    out_ref,
    # scratch
    acc, rib, buf, sem,
    *, plan: _Plan, oh: int, ow: int, trunc_u8: bool, precise: bool,
    do_norm: bool, mean_s, std_s, interp: str = "linear",
):
    nj = plan.n_chunks
    f = pl.program_id(0)
    j = pl.program_id(1)
    step = f * nj + j
    rows = plan.chunk_rows + 8
    h_img = src_hbm.shape[1]

    def dma(slot, ff, jj):
        # 8-aligned DMA base (i8 HBM tiling requires it); the runtime
        # residual shift rem ∈ [0, 8] is baked into the prefetched
        # weight variant (see the wy index map).
        row0 = top_ref[0] + starts_ref[jj]
        base = jnp.minimum((row0 // 8) * 8, h_img - rows)
        return pltpu.make_async_copy(
            src_hbm.at[ff, pl.ds(pl.multiple_of(base, 8), rows), :],
            buf.at[slot],
            sem.at[slot],
        )

    # Keep plan.nbuf DMAs in flight across grid steps: the chunks are
    # a few hundred KB each, so a single outstanding copy leaves the
    # stream issue-latency-bound far below HBM bandwidth.
    nbuf = plan.nbuf
    n_total = pl.num_programs(0) * nj

    @pl.when(step == 0)
    def _():
        # Warm-up: issue the first nbuf-1 copies (static indices).
        for k in range(nbuf - 1):
            @pl.when(k < n_total)
            def _():
                dma(k % nbuf, k // nj, k % nj).start()

    nxt = step + nbuf - 1

    @pl.when(nxt < n_total)
    def _():
        dma(nxt % nbuf, nxt // nj, nxt % nj).start()

    dma(step % nbuf, f, j).wait()

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    # Vertical banded pass: (RW, CH) @ (CH, W*3) into the out-row
    # window.  u8 is exact in bf16 (≤8 significand bits); Mosaic has
    # no direct u8→float cast, so widen via int32.
    # u8→i16→bf16 is the cheapest exact widen Mosaic lowers
    # (no direct u8→float cast); u8 ≤ 255 is exact in bf16.  (A
    # column-split variant that halved the widen temporaries measured
    # ~6% slower end-to-end — one full-width dot wins.)
    chunk = buf[step % nbuf].astype(jnp.int16).astype(jnp.bfloat16)
    part = _dot(wy_ref[0, 0, 0], chunk)
    if precise:
        part += _dot(wy_ref[1, 0, 0], chunk)
    r0 = pl.multiple_of(out0_ref[j], 8)
    acc[pl.ds(r0, plan.row_win), :] += part

    # Frame's last chunk: horizontal banded pass + trunc + deinterleave
    # + moments + normalize, all in VMEM; write the planar block.
    @pl.when(j == nj - 1)
    def _():
        for b in range(plan.n_xblocks):  # static unroll
            c0 = plan.xstarts[b]
            a = acc[:oh, c0 : c0 + plan.xband]
            ahi = a.astype(jnp.bfloat16)
            out = _dot(ahi, wx_ref[0, b])
            if precise:
                alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
                out += _dot(ahi, wx_ref[1, b])
                out += _dot(alo, wx_ref[0, b])
                out += _dot(alo, wx_ref[1, b])
            rib[:, b * _LANE : (b + 1) * _LANE] = out
        r = rib[...]
        if trunc_u8:
            # vacv fixed-point parity: Q22 truncation on non-negative
            # data == floor (resize_naive.cpp:61-64); epsilon absorbs
            # f32 rounding of exactly-representable sums.  Cubic and
            # nearest have no fixed-point reference path — they match
            # the resize op's OpenCV-style half-up rounding
            # (ops/resize.py:419) so the fused route is interchangeable
            # with the vmapped chain.
            eps = 1e-4 if interp == "linear" else 0.5
            r = jnp.clip(jnp.floor(r + eps), 0.0, 255.0)
        # HWC→CHW deinterleave as 0/1 selection matmuls: G[s, o] picks
        # interleaved lane s = o*3+c for out pixel o of channel c,
        # built per 128-lane output block to bound the field
        # temporaries.  For the truncated-u8 path r holds 8-bit
        # integers, so one DEFAULT bf16 MXU pass is exact; the f32
        # path Dekker-splits r when ``precise`` (CPU differential
        # tests).  Raw planes land in the out block; stats + the
        # normalize scale then run in place.
        n = float(oh * ow)
        exact_bf16 = trunc_u8 or not precise
        fdt = jnp.bfloat16
        rhi = r.astype(fdt)
        if not exact_bf16:
            rlo = (r - rhi.astype(jnp.float32)).astype(fdt)
        rr = jax.lax.broadcasted_iota(jnp.int32, (plan.op3, _LANE), 0)
        tb = jax.lax.broadcasted_iota(jnp.int32, (plan.op3, _LANE), 1)
        for c in range(3):
            for ob in range(plan.owp // _LANE):
                to = tb + ob * _LANE
                G = ((rr == to * 3 + c) & (to < ow)).astype(fdt)
                blk = _dot(rhi, G)
                if not exact_bf16:
                    blk += _dot(rlo, G)
                wblk = min(_LANE, ow - ob * _LANE)
                out_ref[0, c, :, ob * _LANE : ob * _LANE + wblk] = blk[
                    :, :wblk
                ]
            if do_norm:
                plane = out_ref[0, c]
                if mean_s is None:
                    mu = jnp.sum(plane) / n
                else:
                    mu = jnp.float32(mean_s[c])
                if std_s is None:
                    m_self = mu if mean_s is None else jnp.sum(plane) / n
                    d = plane - m_self
                    sd = jnp.sqrt(jnp.sum(d * d) / n)
                else:
                    sd = jnp.float32(std_s[c])
                out_ref[0, c] = (plane - mu) / (sd + EPS)


@functools.lru_cache(maxsize=64)
def _plan_tables(key, precise: bool):
    """Device-resident weight tables for a plan, materialized OUTSIDE
    any jit trace: closed-over device arrays become lifted parameters
    of the compiled executable instead of multi-MB HLO literals (which
    bloat compile time on the remote compile service).

    ``key`` is the full plan key (incl. its precise-VMEM flag);
    ``precise`` separately selects whether the lo Dekker halves load."""
    plan = _plan(*key)
    with jax.ensure_compile_time_eval():  # concrete even under a trace
        wy = jnp.asarray(plan.wy if precise else plan.wy[:1])
        wx = jnp.asarray(plan.wx if precise else plan.wx[:1])
        starts = jnp.asarray(plan.starts, jnp.int32)
        out0 = jnp.asarray(plan.out_row0, jnp.int32)
    return wy, wx, starts, out0


@functools.partial(
    jax.jit,
    static_argnames=("left", "cw", "ch", "oh", "ow", "trunc_u8",
                     "precise", "interpret", "do_norm", "mean_s",
                     "std_s", "interp"),
)
def _call(batch, top, wy_arr, wx_arr, starts_arr, out0_arr, *, left, cw,
          ch, oh, ow, trunc_u8, precise, interpret, do_norm=True,
          mean_s=None, std_s=None, interp="linear"):
    n, h, w, _ = batch.shape
    # precise doubles the streamed weight blocks, shrinking the VMEM
    # headroom — but only on a real device; interpret mode (CPU tests)
    # has no VMEM, so it must not change the plan.
    plan = _plan(h, w, left, cw, ch, oh, ow, precise and not interpret,
                 interp)
    src = batch.reshape(n, h, w * 3)
    kern = functools.partial(
        _kernel, plan=plan, oh=oh, ow=ow, trunc_u8=trunc_u8,
        precise=precise, do_norm=do_norm, mean_s=mean_s, std_s=std_s,
        interp=interp,
    )
    rows = plan.chunk_rows + 8

    def wy_index(f, j, top_ref, starts_ref, out0_ref):
        # Pick the weight variant matching the chunk's DMA alignment
        # shift (see the dma() comment in the kernel).
        row0 = top_ref[0] + starts_ref[j]
        base = jnp.minimum((row0 // 8) * 8, h - rows)
        return (0, row0 - base, j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, plan.n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(
                # hi half only unless the Dekker-exact path needs lo
                (2 if precise else 1, 1, 1, plan.row_win, rows),
                wy_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 3, oh, ow), lambda f, j, *_: (f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            # row_win windows are 8-row aligned and may reach past a
            # non-multiple-of-8 oh — pad the accumulator rows.
            pltpu.VMEM((_ceil_to(oh, 8), w * 3), jnp.float32),
            pltpu.VMEM((oh, plan.op3), jnp.float32),
            pltpu.VMEM((plan.nbuf, rows, w * 3), jnp.uint8),
            pltpu.SemaphoreType.DMA((plan.nbuf,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 3, oh, ow), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([top], jnp.int32),
        starts_arr,
        out0_arr,
        src,
        wy_arr,
        wx_arr,
    )


def _pad_geometry(h, w):
    """The wrapper's padded (h, w) for a frame: rows to a multiple of 8
    (8-aligned DMA windows) and columns so w*3 is a multiple of 128
    (Mosaic rejects ragged lane slices of the HBM source; 3 and 128
    are coprime, so dw = -w*3 * 3^-1 mod 128 with 3^-1 = 43).  Already-
    aligned frames (every ladder size >= 640x360) pad nothing."""
    dw = (-(w * 3) * 43) % 128
    return _ceil_to(h, 8), w + dw


def plan_supported(h, w, left, cw, ch, oh, ow,
                   precise: bool = False,
                   interp: str = "linear") -> bool:
    """Can the fused kernel run this config?  (Odd geometries plan
    with the wrapper's pad applied, mirroring preprocess_fused_batch;
    pass ``precise`` when the caller will run the Dekker-exact path on
    device — it tightens the VMEM budget.)
    """
    if left < 0 or cw <= 0 or ch <= 0 or left + cw > w or ch > h:
        return False  # crop must sit inside the REAL frame, not the pad
    if interp not in ("linear", "cubic", "nearest"):
        return False
    hp, wp = _pad_geometry(h, w)
    return _plan(hp, wp, left, cw, ch, oh, ow, precise,
                 interp) is not None


def _static_stats(v):
    """Return stats as a static 3-tuple of floats, or None.

    Raises TypeError for traced/jax-array stats — the kernel bakes the
    scale constants into the compiled program (the production case:
    dataset constants like ImageNet's), so they must be concrete.
    """
    if v is None:
        return None
    if isinstance(v, jax.core.Tracer) or isinstance(v, jax.Array):
        try:
            v = np.asarray(jax.device_get(v))
        except Exception as e:  # traced under jit — not concretizable
            raise ValueError(
                "fused preprocess needs concrete (static) mean/stddev"
            ) from e
    arr = np.asarray(v, np.float32).reshape(-1)
    if arr.size == 1:
        arr = np.repeat(arr, 3)
    return tuple(float(x) for x in arr[:3])


def preprocess_fused_batch(
    batch,
    crop_rect=None,
    out_size=(224, 224),
    *,
    top=None,
    mean=None,
    stddev=None,
    normalize=True,
    trunc_u8=True,
    precise=False,
    interp="linear",
):
    """Fused crop→resize→CHW→f32→normalize over a (N, H, W, 3) u8 batch.

    ``crop_rect``: VRect-like (static); ``top`` optionally overrides the
    rect's top with a *runtime* scalar (same row count).  ``mean`` /
    ``stddev`` are static per-channel constants (None → per-image
    self-stats computed in-kernel).  Returns (N, 3, oh, ow) f32.
    Raises ValueError for unsupported configs (callers fall back to
    the jnp pipeline).
    """
    if batch.dtype != jnp.uint8 or batch.ndim != 4 or batch.shape[-1] != 3:
        raise ValueError("fused preprocess needs (N, H, W, 3) uint8")
    n, h, w, _ = batch.shape
    if crop_rect is None:
        left, top0, cw, ch = 0, 0, w, h
    else:
        left, top0 = int(crop_rect.left), int(crop_rect.top)
        cw = int(crop_rect.width())
        ch = int(crop_rect.height())
    ow, oh = int(out_size[0]), int(out_size[1])
    if left < 0 or cw <= 0 or ch <= 0 or left + cw > w or ch > h:
        # Bounds-check against the REAL frame before padding: the jnp
        # fallback clamps such crops, so accepting them here would
        # silently resize black pad pixels instead.
        raise ValueError("crop rect outside the frame")
    hp, wp = _pad_geometry(h, w)
    if (hp, wp) != (h, w):
        # Odd geometries (the reference's 176x144 / 284x214 assets)
        # pay a one-time bottom/right pad — an extra pass over a small
        # frame, still far cheaper than the jnp chain.  Crop taps
        # never reference the pad.
        batch = jnp.pad(
            batch, ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        )
        h, w = hp, wp
    pv = precise and not config.pallas_interpret()
    if _plan(h, w, left, cw, ch, oh, ow, pv, interp) is None:
        raise ValueError("config not supported by the fused kernel")
    config.record_kernel("preprocess_fused")
    wy_arr, wx_arr, starts_arr, out0_arr = _plan_tables(
        (h, w, left, cw, ch, oh, ow, pv, interp), precise
    )
    (res,) = _call(
        batch,
        top0 if top is None else top,
        wy_arr, wx_arr, starts_arr, out0_arr,
        left=left, cw=cw, ch=ch, oh=oh, ow=ow,
        trunc_u8=trunc_u8, precise=precise,
        do_norm=bool(normalize),
        mean_s=_static_stats(mean), std_s=_static_stats(stddev),
        interpret=config.pallas_interpret(), interp=interp,
    )
    return res


# ===================================================================
# NV12/NV21 camera input: decode -> crop -> resize -> CHW -> normalize
# in ONE HBM pass (reference chain: cvt_color.cpp:151-156 feeding
# resize_normalize.cpp:15-107 — BASELINE configs 2/5).
#
# The BGR kernel's interleaved-lane machinery disappears here: the NV
# source is planar (Y stacked over interleaved VU), so the pipeline
# stays planar end to end — per-chunk Q7 decode (the yuv2bgr kernel's
# lane roll+parity select and an in-kernel 0/1 row-repeat matmul whose
# row map is built from the runtime DMA base), per-channel banded
# vertical/horizontal Q11 resize matmuls, in-VMEM moments + scale, and
# NO deinterleave stage at all (the output is planar already).
# ===================================================================


@dataclass(frozen=True)
class _NvPlan:
    n_chunks: int
    chunk_rows: int      # CH (Y rows per chunk)
    rows_c: int          # chroma buffer rows per chunk
    row_win: int
    starts: tuple
    out_row0: tuple
    c_clamp: int         # largest admissible 8-aligned chroma DMA start
    needs_pad: bool      # wrapper must 8-align the stacked buffer rows
    owp: int
    n_xblocks: int
    xband: int
    xstarts: tuple
    wy: np.ndarray       # (9, n_chunks, RW, CH+8) hi/lo split applied
    wx: np.ndarray       # (2, n_xblocks, xband, 128) bf16 hi/lo
    vmem_bytes: int
    nbuf: int


@functools.lru_cache(maxsize=64)
def _plan_nv(h_img: int, w_img: int, top: int | None, left: int, cw: int,
             ch: int, oh: int, ow: int,
             precise: bool = False) -> _NvPlan | None:
    """NV plan: h_img/w_img are the *Y-plane* dims of the stacked
    (h*3//2, w) buffer.  ``top`` may be None — a RUNTIME crop top
    (round-4 lift): the chroma DMA start is then computed in-kernel
    from the runtime Y base with the same 8-aligned formula, and the
    plan validates window coverage over every alignment phase and
    clamp edge a runtime top can produce.  The stacked buffer is
    wrapper-padded to 8-aligned rows, so the old h*3//2 % 8 tail-row
    rejection (bottom crops, full-height crops of short frames) is
    gone.  Returns None if unsupported."""
    if ch <= 0:
        return None
    cands = sorted(
        (
            (chunk, nbuf)
            for chunk in range(32, min(225, max(ch + 1, 33)), 8)
            for nbuf in (6, 4, 3, 2)
        ),
        key=lambda cn: (
            -(-ch // cn[0])
            * (cn[0] + 8 + 48)
            * (1.0 + 0.15 * max(0, 4 - cn[1]) ** 2)
            / (1.06 if cn[1] >= 6 else 1.0),
            -cn[0],
        ),
    )
    for chunk, nbuf in cands:
        p = _plan_nv_with_chunk(
            h_img, w_img, top, left, cw, ch, oh, ow, chunk, nbuf, precise
        )
        if p is not None:
            return p
    return None


def _plan_nv_with_chunk(h_img, w_img, top, left, cw, ch, oh, ow,
                        chunk, nbuf=_NBUF, precise=False) -> _NvPlan | None:
    if left < 0 or cw <= 0 or ch <= 0 or left + cw > w_img or ch > h_img:
        return None
    if top is not None and (top < 0 or top + ch > h_img):
        return None
    if h_img % 8 or w_img % 2 or w_img % _LANE:
        # Y height must be 8-aligned (DMA windows; camera frames are);
        # the wrapper lane-pads odd widths before planning.
        return None
    if ch < chunk or h_img < chunk + 8:
        return None

    vert = _vertical_plan(ch, oh, chunk)  # NV chain is linear-only
    if vert is None:
        return None
    n_chunks, starts, out0, row_win, wy = vert

    # Chroma DMA windows are computed in-kernel from the runtime Y
    # base; the plan validates coverage.  +8 slack rows absorb the
    # base-phase variation a runtime top introduces.  Coverage is
    # checked against the UNPADDED buffer first; only when a window
    # needs the misaligned tail rows (h·3/2 % 8 ≠ 0 AND the crop
    # reaches the bottom) does the plan demand the wrapper's 8-aligned
    # row pad — inset crops stay pad-free (a 1080p batch-32 pad is a
    # ~100 MB HBM copy).
    rows = chunk + 8
    rows_c = _ceil_to(chunk // 2 + 12, 8) + 8
    hbuf_raw = h_img * 3 // 2
    if top is None:
        # Runtime top: only the base's mod-16 phase and the two clamp
        # edges change the window geometry — check those tops.
        top_hi = h_img - ch
        check_tops = sorted(
            set(range(0, min(top_hi, 15) + 1))
            | set(range(max(0, top_hi - 15), top_hi + 1))
        )
    else:
        check_tops = [top]

    def covers(c_clamp):
        for tp in check_tops:
            for s in starts:
                base = min(((tp + s) // 8) * 8, h_img - rows)
                c0 = min(((h_img + base // 2) // 8) * 8, c_clamp)
                # Window must reach the chunk's last chroma row.
                if c0 + rows_c <= h_img + (base + rows - 1) // 2:
                    return False
        return True

    c_clamp = needs_pad = None
    for hbuf, pad in ((hbuf_raw, False), (_ceil_to(hbuf_raw, 8), True)):
        if pad and hbuf == hbuf_raw:
            break  # already aligned — nothing a pad could add
        cc = ((hbuf - rows_c) // 8) * 8
        if cc >= 0 and covers(cc):
            c_clamp, needs_pad = cc, pad
            break
    if c_clamp is None:
        return None

    # ---- horizontal: planar banded Q11 bilinear ------------------
    wx_full = _linear_weights(cw, ow, quantize=True)  # (ow, cw)
    owp = _ceil_to(ow, _LANE)
    n_xblocks = owp // _LANE
    taps = [np.nonzero(wx_full[o])[0] for o in range(ow)]
    raw, xband = [], _LANE
    for b in range(n_xblocks):
        src_lanes = [
            left + t
            for o in range(b * _LANE, min((b + 1) * _LANE, ow))
            for t in taps[o]
        ]
        if not src_lanes:
            raw.append(None)
            continue
        c0 = (min(src_lanes) // _LANE) * _LANE
        raw.append((c0, max(src_lanes) + 1))
        xband = max(xband, _ceil_to(max(src_lanes) + 1 - c0, _LANE))
    if xband > w_img:
        return None
    xband += (w_img - xband) % _LANE  # slid starts stay lane-aligned
    xstarts = []
    wx = np.zeros((n_xblocks, xband, _LANE), np.float32)
    for b in range(n_xblocks):
        if raw[b] is None:
            xstarts.append(0)
            continue
        c0 = min(raw[b][0], w_img - xband)
        xstarts.append(c0)
        for o in range(b * _LANE, min((b + 1) * _LANE, ow)):
            for t in taps[o]:
                wx[b, left + t - c0, o - b * _LANE] = wx_full[o, t]

    wx_hl = _split_hi_lo(wx)
    vmem = (
        3 * oh * w_img * 4               # per-channel f32 accumulators
        + nbuf * rows * w_img            # pipelined u8 Y chunks
        + nbuf * rows_c * w_img          # pipelined u8 VU chunks
        + 4 * rows * w_img * 4           # decode temporaries (peak)
        + row_win * rows * 2 * 2 * (2 if precise else 1)
        + wx_hl.nbytes // (1 if precise else 2)
        + 3 * oh * owp * 4               # planar out block
        + oh * xband * 4                 # horizontal operand temp
    )
    if vmem > _VMEM_BUDGET:
        return None
    return _NvPlan(
        n_chunks, chunk, rows_c, row_win, tuple(starts), tuple(out0),
        c_clamp, needs_pad, owp, n_xblocks, xband, tuple(xstarts),
        _split_hi_lo(wy), wx_hl, vmem, nbuf,
    )


def _kernel_nv(
    # scalar prefetch
    top_ref, starts_ref, out0_ref,
    # inputs
    src_hbm, wy_ref, wx_ref,
    # outputs
    out_ref,
    # scratch
    acc, ybuf, cbuf, ysem, csem,
    *, plan: _NvPlan, h_y: int, oh: int, ow: int, is_nv12: bool,
    to_rgb: bool, trunc_u8: bool, precise: bool, do_norm, mean_s,
    std_s,
):
    nj = plan.n_chunks
    f = pl.program_id(0)
    j = pl.program_id(1)
    step = f * nj + j
    rows = plan.chunk_rows + 8
    rows_c = plan.rows_c

    def base_of(jj):
        # Clamp BOTH ends (round-5 ADVICE fix): a traced negative
        # ``top`` bypasses the wrapper's python-int bounds check, and
        # an unclamped negative row0 would start the Y DMA before the
        # buffer.  Over-large tops were already clamped from above.
        row0 = top_ref[0] + starts_ref[jj]
        return jnp.clip((row0 // 8) * 8, 0, h_y - rows)

    def cstart_of(jj):
        # Runtime chroma window start from the runtime Y base (round-4
        # lift; genuinely 8-aligned: base is 8-aligned so (h_y+base//2)
        # //8*8 and the static clamp both are).  May dip into the Y
        # region; garbage rows are never referenced by the row map, and
        # the plan validated coverage for every base phase.
        b = base_of(jj)
        return jnp.minimum(((h_y + b // 2) // 8) * 8, plan.c_clamp)

    def dma_y(slot, ff, jj):
        return pltpu.make_async_copy(
            src_hbm.at[ff, pl.ds(pl.multiple_of(base_of(jj), 8), rows), :],
            ybuf.at[slot],
            ysem.at[slot],
        )

    def dma_c(slot, ff, jj):
        return pltpu.make_async_copy(
            src_hbm.at[ff, pl.ds(pl.multiple_of(cstart_of(jj), 8), rows_c), :],
            cbuf.at[slot],
            csem.at[slot],
        )

    nbuf = plan.nbuf
    n_total = pl.num_programs(0) * nj

    @pl.when(step == 0)
    def _():
        for k in range(nbuf - 1):
            @pl.when(k < n_total)
            def _():
                dma_y(k % nbuf, k // nj, k % nj).start()
                dma_c(k % nbuf, k // nj, k % nj).start()

    nxt = step + nbuf - 1

    @pl.when(nxt < n_total)
    def _():
        dma_y(nxt % nbuf, nxt // nj, nxt % nj).start()
        dma_c(nxt % nbuf, nxt // nj, nxt % nj).start()

    dma_y(step % nbuf, f, j).wait()
    dma_c(step % nbuf, f, j).wait()

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    # ---- Q7 NV decode for this chunk (yuv2bgr kernel's scheme) ----
    w_img = ybuf.shape[2]
    vu = cbuf[step % nbuf].astype(jnp.int32)  # (rows_c, W)
    even = jax.lax.broadcasted_iota(jnp.int32, (rows_c, w_img), 1) % 2 == 0
    second = pltpu.roll(vu, 1, 1)
    prev = pltpu.roll(vu, w_img - 1, 1)
    a_full = jnp.where(even, vu, second)      # pair's lane-0 byte
    b_full = jnp.where(even, prev, vu)        # pair's lane-1 byte
    if is_nv12:
        u, v = a_full - 128, b_full - 128
    else:
        v, u = a_full - 128, b_full - 128
    ra = (179 * v) >> 7
    ga = (44 * u + 91 * v) >> 7
    ba = (227 * u) >> 7
    # One row-repeat dot for all three adders (lane-concatenated).
    adders = jnp.concatenate([ba, ga, ra], axis=1)

    # Row map Y buffer row i -> chroma buffer row, built from the
    # runtime DMA bases: rep[i, jj] = (jj == h_y + (base+i)//2 - a8).
    base = base_of(j)
    a8 = cstart_of(j)
    ii = jax.lax.broadcasted_iota(jnp.int32, (rows, rows_c), 0)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (rows, rows_c), 1)
    rep = (jj2 == (h_y + (base + ii) // 2 - a8)).astype(jnp.bfloat16)

    up3 = jax.lax.dot_general(  # adders are 9-bit ints: bf16 is exact
        rep, adders.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    y = ybuf[step % nbuf].astype(jnp.int32).astype(jnp.float32)
    planes = (
        jnp.clip(y + up3[:, :w_img], 0.0, 255.0),              # B
        jnp.clip(y - up3[:, w_img : 2 * w_img], 0.0, 255.0),   # G
        jnp.clip(y + up3[:, 2 * w_img :], 0.0, 255.0),         # R
    )

    # ---- vertical banded pass, per channel ------------------------
    # Accumulator channel order is the OUTPUT order: RGB configs
    # (COLOR_YUV2RGB_*) just reverse the plane index here.
    r0 = pl.multiple_of(out0_ref[j], 8)
    for c in range(3):
        pc = planes[2 - c if to_rgb else c].astype(jnp.bfloat16)
        part = _dot(wy_ref[0, 0, 0], pc)
        if precise:
            part += _dot(wy_ref[1, 0, 0], pc)
        acc[c, pl.ds(r0, plan.row_win), :] += part

    # ---- frame's last chunk: horizontal + trunc + normalize -------
    @pl.when(j == nj - 1)
    def _():
        for c in range(3):
            for b in range(plan.n_xblocks):
                c0 = plan.xstarts[b]
                a = acc[c, :oh, c0 : c0 + plan.xband]
                ahi = a.astype(jnp.bfloat16)
                out = _dot(ahi, wx_ref[0, b])
                if precise:
                    alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
                    out += _dot(ahi, wx_ref[1, b])
                    out += _dot(alo, wx_ref[0, b])
                    out += _dot(alo, wx_ref[1, b])
                if trunc_u8:
                    out = jnp.clip(jnp.floor(out + 1e-4), 0.0, 255.0)
                wblk = min(_LANE, ow - b * _LANE)
                out_ref[0, c, :, b * _LANE : b * _LANE + wblk] = out[
                    :, :wblk
                ]
            if do_norm:
                n = float(oh * ow)
                plane = out_ref[0, c]
                if mean_s is None:
                    mu = jnp.sum(plane) / n
                else:
                    mu = jnp.float32(mean_s[c])
                if std_s is None:
                    m_self = mu if mean_s is None else jnp.sum(plane) / n
                    d = plane - m_self
                    sd = jnp.sqrt(jnp.sum(d * d) / n)
                else:
                    sd = jnp.float32(std_s[c])
                out_ref[0, c] = (plane - mu) / (sd + EPS)


@functools.lru_cache(maxsize=64)
def _plan_nv_tables(key, precise: bool):
    plan = _plan_nv(*key)
    with jax.ensure_compile_time_eval():
        wy = jnp.asarray(plan.wy if precise else plan.wy[:1])
        wx = jnp.asarray(plan.wx if precise else plan.wx[:1])
        starts = jnp.asarray(plan.starts, jnp.int32)
        out0 = jnp.asarray(plan.out_row0, jnp.int32)
    return wy, wx, starts, out0


@functools.partial(
    jax.jit,
    static_argnames=("h_y", "plan_top", "left", "cw", "ch", "oh", "ow",
                     "is_nv12", "to_rgb", "trunc_u8", "precise",
                     "interpret", "do_norm", "mean_s", "std_s"),
)
def _call_nv(batch, top_arr, wy_arr, wx_arr, starts_arr, out0_arr,
             *, h_y, plan_top, left, cw, ch, oh, ow, is_nv12, to_rgb,
             trunc_u8, precise, interpret, do_norm=True, mean_s=None,
             std_s=None):
    n, hbuf, w = batch.shape
    plan = _plan_nv(h_y, w, plan_top, left, cw, ch, oh, ow,
                    precise and not interpret)
    kern = functools.partial(
        _kernel_nv, plan=plan, h_y=h_y, oh=oh, ow=ow, is_nv12=is_nv12,
        to_rgb=to_rgb, trunc_u8=trunc_u8, precise=precise,
        do_norm=do_norm, mean_s=mean_s, std_s=std_s,
    )
    rows = plan.chunk_rows + 8

    def wy_index(f, j, top_ref, starts_ref, out0_ref):
        row0 = top_ref[0] + starts_ref[j]
        base = jnp.minimum((row0 // 8) * 8, h_y - rows)
        return (0, row0 - base, j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, plan.n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(
                (2 if precise else 1, 1, 1, plan.row_win, rows),
                wy_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 3, oh, ow), lambda f, j, *_: (f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, _ceil_to(oh, 8), w), jnp.float32),
            pltpu.VMEM((plan.nbuf, rows, w), jnp.uint8),
            pltpu.VMEM((plan.nbuf, plan.rows_c, w), jnp.uint8),
            pltpu.SemaphoreType.DMA((plan.nbuf,)),
            pltpu.SemaphoreType.DMA((plan.nbuf,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 3, oh, ow), jnp.float32),
        ],
        interpret=interpret,
    )(
        top_arr,
        starts_arr,
        out0_arr,
        batch,
        wy_arr,
        wx_arr,
    )


def _nv_pad_w(w):
    """Wrapper lane pad for NV frames: w to a multiple of 128 (even,
    so VU pair parity is preserved)."""
    return _ceil_to(w, _LANE)


def nv_plan_supported(h, w, left, cw, ch, oh, ow, top=0,
                      precise: bool = False) -> bool:
    """Can the NV fused kernel run this config?  h/w are Y-plane dims."""
    if h % 2 or w % 2:
        return False
    if left < 0 or cw <= 0 or ch <= 0 or left + cw > w or ch > h:
        return False  # crop must sit inside the REAL frame, not the pad
    return _plan_nv(
        h, _nv_pad_w(w), top, left, cw, ch, oh, ow, precise
    ) is not None


def preprocess_fused_nv_batch(
    batch,
    crop_rect=None,
    out_size=(224, 224),
    *,
    is_nv12=False,
    to_rgb=False,
    top=None,
    mean=None,
    stddev=None,
    normalize=True,
    trunc_u8=True,
    precise=False,
):
    """Fused NV decode → crop → resize → planar f32 → normalize over a
    (N, H*3//2, W) u8 stacked NV batch (Y over interleaved VU —
    NV21 by default, ``is_nv12=True`` for UV order).

    Matches the reference camera chain decode-then-preprocess
    (cvt_color.cpp:151-156 → resize_normalize.cpp:15-107) bit-for-bit
    in its Q7/Q11 integer semantics, in ONE pass over HBM.  Returns
    (N, 3, oh, ow) f32 (B, G, R planes; R, G, B with ``to_rgb``).  Raises ValueError for
    unsupported configs (callers fall back to decode + jnp chain).

    ``top`` (round-4 lift): a RUNTIME crop top — python int or traced
    scalar — overriding ``crop_rect.top`` (the tracking-camera moving
    ROI case; the reference chain supports any crop because decode and
    crop are separate ops, cvt_color.cpp:151-156).  The caller must
    keep ``top + crop_height <= H``; the kernel clamps reads in-bounds
    but out-of-contract tops return pixels from the clamped window.
    """
    if batch.dtype != jnp.uint8 or batch.ndim != 3:
        raise ValueError("fused NV preprocess needs (N, H*3//2, W) uint8")
    n, hbuf, w = batch.shape
    if hbuf % 3 or w % 2:
        raise ValueError("NV buffer needs H*3//2 rows and even width")
    h = hbuf * 2 // 3
    if crop_rect is None:
        left, top0, cw, ch = 0, 0, w, h
    else:
        left, top0 = int(crop_rect.left), int(crop_rect.top)
        cw = int(crop_rect.width())
        ch = int(crop_rect.height())
    ow, oh = int(out_size[0]), int(out_size[1])
    if left < 0 or cw <= 0 or ch <= 0 or left + cw > w or ch > h:
        raise ValueError("crop rect outside the frame")
    if top is None:
        plan_top, top_val = top0, top0
    else:
        # Runtime top: plan for EVERY admissible top (plan_top=None).
        plan_top = None
        if isinstance(top, (int, np.integer)):
            if top < 0 or top + ch > h:
                raise ValueError("crop rect outside the frame")
        top_val = top
    wp = _nv_pad_w(w)
    pv = precise and not config.pallas_interpret()
    plan = _plan_nv(h, wp, plan_top, left, cw, ch, oh, ow, pv)
    if plan is None:
        raise ValueError("config not supported by the fused NV kernel")
    # Lane-pad the width; 8-align the stacked buffer rows only when
    # the plan's chroma windows actually reach the misaligned tail
    # (bottom/full-height crops of h*3//2 % 8 != 0 frames) — inset
    # crops skip the full-batch pad copy.
    hbp = _ceil_to(hbuf, 8) if plan.needs_pad else hbuf
    if wp != w or hbp != hbuf:
        batch = jnp.pad(batch, ((0, 0), (0, hbp - hbuf), (0, wp - w)))
    config.record_kernel("preprocess_fused_nv")
    wy_arr, wx_arr, starts_arr, out0_arr = _plan_nv_tables(
        (h, wp, plan_top, left, cw, ch, oh, ow, pv), precise
    )
    top_arr = jnp.reshape(jnp.asarray(top_val, jnp.int32), (1,))
    (res,) = _call_nv(
        batch,
        top_arr,
        wy_arr, wx_arr, starts_arr, out0_arr,
        h_y=h, plan_top=plan_top,
        left=left, cw=cw, ch=ch, oh=oh, ow=ow, is_nv12=is_nv12,
        to_rgb=to_rgb, trunc_u8=trunc_u8, precise=precise,
        do_norm=bool(normalize),
        mean_s=_static_stats(mean), std_s=_static_stats(stddev),
        interpret=config.pallas_interpret(),
    )
    return res
