"""Pallas affine-warp kernel — exact bilinear, gather-free.

The jnp warp (``ops/warp_affine.py``) is exact but gather-bound: XLA's
per-element 2D gather runs at ~1 element/cycle (~56 Mpx/s measured at
1440p — 16 ms/frame).  This kernel removes the gather, per the SURVEY
§7 "hard parts" plan (tiled inverse mapping with per-tile bounding-box
loads), using 0/1 SELECTION MATMULS on the MXU for the horizontal taps
and an iota-compare weight field on the VPU for the vertical taps.

Round-3 redesign (the round-2 kernel was MXU-bound on oversized
selection dots — 0.678 ms at 1080p u8):

* **Row-strip grid**: one grid step produces t=8 output rows × the
  full padded output width (a static loop over lane-blocks inside the
  step), cutting grid steps ~8× (per-step overhead ~0.7 µs measured).
* **K=128 tap windows**: the selection dot's contraction axis is a
  fixed 128-column source window per lane-block.  The lane-block width
  lb ∈ {128, 64, 32, 16} adapts to the matrix so the tap span
  ``|m0|·(lb-1) + |m1|·(t-1) + 3`` fits 126 columns — large downscales
  use narrower blocks instead of a wider (2× more expensive) window.
  Window alignment is a 256-wide aligned slice + dynamic lane-roll.
* **Both taps from ONE rolled band** (round 4): the two x taps are two
  iota-compare fields (keys ``sx_rel`` / ``sx_rel + 1``) against a
  single dynamically-rolled 128-column window — a second dynamic roll
  (multi-stage lane permute) cost more than the extra field build it
  saved.  The window's +3 margin guarantees the roll's wrap column is
  never selected by either field.
* **f32 via a two-term bf16 split**: the f32 band is split hi/lo into
  two bf16 operands; two bf16 selection dots replace the ~6-pass
  HIGHEST-precision f32 dot.  Two bf16 terms carry ~16 of f32's 24
  mantissa bits, so general f32 inputs see ~2⁻¹⁶-relative error on
  the selected values (NOT exact); u8-derived and f16-derived values
  (≤11 significant bits) ARE captured exactly, and the u8 path's
  integer band values are exact in one bf16 pass.
* **Per-row vertical windows**: rh spans only the lane-block's taps
  (``|m3|·(lb-1) + |m4|·(t-1)``), not a 16-row tile's — about half the
  round-2 dot M-height at the benchmark matrices.

Border handling matches the jnp op's OpenCV mode: per-tap validity
zeroes the tap's weight and the weight deficit is backfilled with the
border value.  The u8 path uses the same Q11-quantized weights as the
reference fixed-point kernel (warp_affine_naive.cpp:31-41) applied
post-dot at f32, with Q22 truncation on write-out — bit-compatible
with the reference arithmetic (≤1 ulp of the jnp op).

Two source-residency modes:

* **resident** (small planes): the padded source planes sit whole in
  VMEM across the strip grid — one HBM read of the source total.
* **streaming** (large planes, e.g. the reference's 2560×1440 f32
  asset at 14 MB/plane): the source stays in HBM; each strip DMAs the
  source row band feeding its full output row into a double-buffered
  VMEM scratch (the next strip's band prefetches while the current
  strip computes), and every lane-block slices its 256-column window
  out of the band.
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
# sources use the streaming row-band mode.  Round-4 raised 8→24 MB
# (the old gate forced one-channel-resident cs=1 plans under vmap at
# 1440p-class u8 sizes, whose M=rh selection dots run the MXU at a
# third of the cs=3 utilization); round-5 raised 24→48 MB so f32
# 1440p-class planes (44 MB for 3 channels) keep cs=3 — the cs=1
# fallback measured 4.37 vs ~2.4 ms for the rot20 f32 frame.  An
# explicit ``vmem_limit_bytes`` accompanies the budget (Mosaic's
# default scoped limit is 16 MB).
_PLANE_BUDGET = 48 * 1024 * 1024
# Per-kernel scoped-VMEM ceiling passed to Mosaic (default is 16 MB,
# which the 24 MB resident plans exceed).
_VMEM_LIMIT = 100 * 1024 * 1024
# VMEM budget for the double-buffered streaming row bands (bytes).
_BAND_BUDGET = 10 * 1024 * 1024
# Output rows per strip: t=16 measured faster than t=8 at every
# benchmark geometry (round 4: 1080p 0.26→0.21, rot20 0.43→0.29,
# cfg5-vmap 0.87→0.73 ms) — taller strips amortize the band loads and
# per-strip field math over 2× the output; rh grows by |m4|·8 only.
# t=8 remains the fallback for tiny outputs and rh-capped matrices.
_T_CANDIDATES = (16, 8)
# A/B selector for the round-5 u8 fast-path experiments (subprocess
# benchmarking; see benchmarks/warp_ab.py):
#   "int"      — i8 digit dots + integer vertical + >>22 epilogue
#   "inthf32"  — i8 digit dots, f32 vertical (H <= 2^20 is f32-exact)
#   "foldbf16" — Q11 weights folded into bf16 hi/lo fields (exact),
#                f32 vertical; no integer VPU ops
#   "pair"     — per-tap 0/1 fields (round-4 structure; measured
#                fastest on device — the folded forms pay more in
#                field construction than they save in dots/vertical)
_VARIANT = __import__("os").environ.get("VACV_WARP_VARIANT", "pair")
# Output store strategy (see the store-stage comment in _kernel):
#   "i32rows"  — u8 rows stored as i32 (clean (8,128) DMA tiles and
#                4x coarser store masking than u8's (32,128)), cast
#                to u8 by XLA outside the kernel; measured ~15%
#                faster end to end than "rows" (warp_store_ab.py);
#                f32 outputs are unaffected by this mode
#   "rows"     — round-4 per-(trow, block) masked stores
#   "flat"/"flati32"/"rev8" — measured dead ends, kept for probes:
#                flat-lane blocks kill the copy-out DMA (1-sublane
#                tiles) and rev8's dynamic-sublane store + revisit
#                overhead loses to plain rows
_STORE = __import__("os").environ.get("VACV_WARP_STORE", "i32rows")
# f32 horizontal-stage strategy (round 5; benchmarks/warp_f32_ab.py):
#   "fold3"  — tap weights folded into ONE selection field, field and
#              band each split hi/lo bf16, and the ~2^-32-relative
#              lo×lo cross term dropped: 3 dots TOTAL for linear
#              (round-4 "pair" spent 4: 2 taps × 2 band terms) and 3
#              for cubic (was 8), plus a single vertical reduce.
#              Same ~2^-16-relative fidelity class as "pair".
#   "pair"   — round-4 per-tap 0/1 fields × 2-term band split.
_F32_VARIANT = __import__("os").environ.get("VACV_WARP_F32", "fold3")
# Force a (t, lb) pair, e.g. "8,32" (A/B probes only; planner picks
# otherwise).
_FORCE_TLB = __import__("os").environ.get("VACV_WARP_TLB")
_T = 8          # minimum strip height (and the sublane-alignment unit)
_KW = 128       # selection-dot contraction width (source window)
# "auto" (default): narrow the contraction window to 64/32 when the
# lane-block's tap span fits (smaller field builds + band slices; A/B
# via warp_f32_ab — rot20 f32 1.95 → 1.74 ms); "128" forces the fixed
# round-4 window.
_KW_MODE = __import__("os").environ.get("VACV_WARP_KW", "auto")
_RH_CAP = 120   # max band rows per lane-block (dot M-height = cs*rh)


def _quantize_q11(w):
    return jnp.floor(w * _COEF_SCALE + 0.5) / _COEF_SCALE


def _cubic_coefs(frac):
    """4-tap A=-0.75 cubic weights (same expression order as the jnp
    route's ``ops/warp_affine._cubic_coefs`` for bit-level agreement;
    OpenCV interpolateCubic)."""
    A = jnp.float32(-0.75)
    f0 = frac + 1.0
    f2 = 1.0 - frac
    c0 = A * f0**3 - 5 * A * f0**2 + 8 * A * f0 - 4 * A
    c1 = (A + 2) * frac**3 - (A + 3) * frac**2 + 1
    c2 = (A + 2) * f2**3 - (A + 3) * f2**2 + 1
    return c0, c1, c2, 1.0 - c0 - c1 - c2


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _spans(minv, t, lb):
    """(x_span, y_span): max tap spread of a (t, lb) output block."""
    m = np.abs(np.asarray(minv, np.float64)).ravel()
    xs = int(np.ceil(m[0] * (lb - 1) + m[1] * (t - 1)))
    ys = int(np.ceil(m[3] * (lb - 1) + m[4] * (t - 1)))
    return xs, ys


def _pick_lb(minv, t=_T, interp="linear"):
    """Largest lane-block width whose taps fit the 128-column window
    (cubic spans 3 more columns: taps sx-1..sx+2, window start -1;
    +2 everywhere for the round-5 scalar corner-evaluation guard)."""
    margin = 8 if interp == "cubic" else 5
    for lb in (128, 64, 32, 16):
        xs, _ = _spans(minv, t, lb)
        if xs + margin <= 126:
            return lb
    return None


def _rh(minv, t, lb, interp="linear"):
    _, ys = _spans(minv, t, lb)
    return _round_up(ys + (15 if interp == "cubic" else 12), 8)


def _row_band_height(minv, t, wp, rh, h_in, interp="linear"):
    """Streaming-mode band height: source rows feeding one full
    (t, wp) output strip, plus per-block slack (8-align both ends;
    cubic taps reach one row above / two below the linear span)."""
    m = np.abs(np.asarray(minv, np.float64)).ravel()
    span = int(np.ceil(m[3] * (wp - 1) + m[4] * (t - 1)))
    slack = 16 if interp == "cubic" else 13
    return min(_round_up(span + slack, 8) + rh + 8, h_in)


def _stream_ok(minv, h_in, w_in, w_out, itemsize):
    """Is the streaming row-band mode available for this config?
    (Delegates to _plan so the gate can never diverge from it.)"""
    plan = _plan(minv, 3, h_in, w_in, h_in, w_out, itemsize)
    return plan is not None and (
        plan["rbh"] > 0
        or h_in % 8 == 0 and w_in % 128 == 0 and w_in >= 256
    )


def _stream_plan(minv, t, lb, rh, wp, c, h_in, w_in, itemsize,
                 interp="linear"):
    """(cs, rbh) for the streaming mode, or None if its gates fail."""
    if h_in % 8 or w_in % 128 or w_in < 256:
        return None
    rbh = _row_band_height(minv, t, wp, rh, h_in, interp)
    if rbh < rh:
        # Short planes (h_in < rh): the per-block vertical window would
        # overrun the streamed band (`pl.ds(off, rh)` of an rbh-row
        # buffer).  The resident mode pads to max(h, rh); streaming
        # cannot — reject so the caller routes there (or to jnp).
        return None
    if 2 * c * rbh * w_in * itemsize <= _BAND_BUDGET:
        return c, rbh
    if 2 * rbh * w_in * itemsize <= _BAND_BUDGET:
        return 1, rbh
    return None


def _plan(minv, c, h_in, w_in, h_out, w_out, itemsize,
          allow_stream=True, interp="linear"):
    """Static kernel plan, or None if unsupported.

    Mode choice for planes that don't fit whole:
    * plain calls prefer STREAMING — its small VMEM footprint lets
      successive independent per-frame launches overlap (measured
      ~1.5x throughput over the resident form at 1440p u8, where a
      resident plane hogs enough VMEM to serialize launches);
    * under vmap (``allow_stream=False``) the ANY-memory-space source
      of the streaming mode cannot lower, so a one-channel-resident
      mode (VMEM blockspecs, channel-grouped grid) serves instead.
    """
    # Mode selection runs per (t, lb) candidate (round-5 ADVICE fix):
    # a geometry whose t=16 streaming band overflows _BAND_BUDGET but
    # whose t=8 band fits used to fall all the way to the ~16 ms XLA
    # gather; now the next candidate is tried before giving up.
    #
    # Candidate ORDER (round 5): u8 keeps the round-4 measured
    # preference — t=16 with the largest feasible lane-block (taller
    # strips amortize loads; the u8 dots are cheap single-pass bf16).
    # f32 plans are dot-MAC-bound (3 bf16 passes over a (cs·rh, kw)
    # band), so candidates are ranked by an empirical cost model
    # fitted to the device A/B ladder (benchmarks/warp_f32_ab.py,
    # rot20 1440p: t16/lb64 3.43 → t8/lb32/kw64 1.74 ms):
    #     cost/output = nd·128·rh  (selection dots; K pads to 128)
    #                 + 20·kw      (field build + band split, VPU)
    #                 + 1.2e6/(t·lb)  (per-block dispatch/roll)
    # which reproduces the measured ranking of all 6 probed configs.
    margin = 8 if interp == "cubic" else 5

    def _kw_for(xs, narrow):
        if not narrow:
            return _KW
        if xs + margin <= 30:
            return 32
        if xs + margin <= 62:
            return 64
        return _KW

    force = None
    if _FORCE_TLB:
        force = tuple(int(v) for v in _FORCE_TLB.split(","))
    # Model-ranked candidates: all f32 plans, and u8 plans off-vmap
    # (the vmapped resident regime measured FASTER on the legacy
    # t16/largest-lb order — cfg5-vmap 0.586 vs 0.600/0.625 ms — while
    # off-vmap u8 1080p measured 0.209 -> 0.175 ms on the model's
    # t16/lb32/kw64 pick).  nd = selection dots per output block:
    # f32 fold3 = 3 (any interp), u8 nearest = 1, u8 cubic = 4,
    # u8 linear = 2.
    # Nearest is single-dot and load/store-bound — the model's
    # dot-centric constants mis-rank it (t16/lb32/kw64 measured 0.172
    # vs the legacy pick's 0.092 ms at the 1080p u8 row); it keeps the
    # legacy order.
    use_model = (itemsize == 4 or allow_stream) and interp != "nearest"
    if itemsize == 4:
        nd = 3
    elif interp == "cubic":
        nd = 4
    else:
        nd = 2
    narrow = _KW_MODE == "auto"
    cands = []
    if force:
        tcs = (force[0],)
    else:
        tcs = tuple(tc for tc in _T_CANDIDATES
                    if not (tc > _T and h_out < tc))
    for tc in tcs:
        if force:
            lbs = (force[1],)
        elif use_model:
            lbs = (128, 64, 32, 16)
        else:
            lb = _pick_lb(minv, tc, interp)
            lbs = (lb,) if lb is not None else ()
        for lbc in lbs:
            xs, _ = _spans(minv, tc, lbc)
            if not force and xs + margin > 126:
                continue
            rh = _rh(minv, tc, lbc, interp)
            if rh > _RH_CAP:
                continue
            kw = _kw_for(xs, narrow)
            cost = (nd * 128 * rh + 20 * kw + 1.2e6 / (tc * lbc))
            cands.append((cost, tc, lbc, rh, kw))
    if use_model and not force:
        cands.sort(key=lambda cand: cand[0])
    for _, t, lb, rh, kw in cands:
        tc = t
        nb = -(-w_out // lb)
        wp = nb * lb
        plane = _round_up(h_in, 8) * _round_up(w_in, 128) * itemsize
        cs = rbh = None
        if plane * c <= _PLANE_BUDGET:
            cs, rbh = c, 0
        else:
            if allow_stream:
                sp = _stream_plan(minv, t, lb, rh, wp, c, h_in, w_in,
                                  itemsize, interp)
                if sp is not None:
                    cs, rbh = sp
            if cs is None and plane <= _PLANE_BUDGET:
                cs, rbh = 1, 0
            if cs is None:
                # Off-vmap callers would stream; a vmapped one cannot
                # (ANY-space sources reject batched block mappings) —
                # try the next t candidate, then give up.
                continue
        if rbh == 0:
            h_pad = max(_round_up(h_in, 8), rh)
            w_pad = max(_round_up(w_in, 128), 256)
        else:
            h_pad, w_pad = h_in, w_in
        return dict(t=t, lb=lb, rh=rh, nb=nb, wp=wp, cs=cs,
                    h_pad=h_pad, w_pad=w_pad, rbh=rbh, kw=kw)
    return None


def warp_supported(minv, h_in, w_in, itemsize: int = 1,
                   w_out: int | None = None, h_out: int | None = None,
                   c: int = 3, allow_stream: bool = True,
                   interp: str = "linear") -> bool:
    """Can the pallas kernel handle this warp config?  Pass
    ``allow_stream=False`` when the call will run under vmap (use
    :func:`under_vmap` on the operand)."""
    return _plan(
        minv, c, h_in, w_in, h_out or h_in, w_out or w_in, itemsize,
        allow_stream, interp,
    ) is not None


def under_vmap(x) -> bool:
    """Is ``x`` a vmap batch tracer?  (The streaming mode's ANY-space
    source cannot lower under vmap; dispatchers use this to pick the
    vmap-safe plan.)"""
    try:
        from jax._src.interpreters import batching

        return isinstance(x, batching.BatchTracer)
    except Exception:  # private API moved — assume the safe answer
        return True


def _kernel(src_ref, out_ref, *scratch, m, h_in, w_in, t, lb, rh, nb, cs,
            h_pad, w_pad, rbh, u8, bv, ns, interp, kw=_KW):
    nearest = interp == "nearest"
    cubic = interp == "cubic"
    # Round-5 integer path (u8 linear/nearest): the Q11 tap weights are
    # folded INTO the selection fields as int8 digit pairs
    # (hi = wq >> 6 in [0,32], lo = wq & 63 — both fit i8), so the two
    # per-tap bf16 selection dots become two int8 digit dots covering
    # BOTH taps (v5e MXU int8 runs 1.4-2x the bf16 rate, probe_i8.py),
    # and the vertical stage reduces ONE field-weighted plane instead
    # of one per tap.  H = sum_k wq_k*p_k is exact in i32 (<= 2^20);
    # the vertical Q11 reduce stays integer (<= 2048*522240 < 2^31)
    # and the write-out is the reference's own `>> 22` truncation
    # (warp_affine_naive.cpp:50-54) — bit-exact fixed-point, no f32
    # rounding anywhere past the coordinate math.  Requires an integer
    # border value; fractional bv falls back to the f32 epilogue.
    u8lin = u8 and not cubic
    # f32 fold3 (round 5): weights inside ONE selection field, 3 dots,
    # one vertical reduce — applies to f32 linear AND cubic (nearest
    # stays the exact 3-term split).
    foldf = (not u8) and not nearest and _F32_VARIANT == "fold3"
    int_h = u8lin and _VARIANT in ("int", "inthf32")
    int_v = (int_h and _VARIANT == "int" and float(bv).is_integer()
             and 0.0 <= float(bv) <= 255.0)
    fold = u8lin and _VARIANT == "foldbf16" and not nearest
    bvq = int(bv) if int_v else 0
    stream = rbh > 0
    s = pl.program_id(1)
    m0, m1, m2, m3, m4, m5 = (jnp.float32(v) for v in m)

    def strip_r0row(ss):
        # Source row band feeding output strip ss: fy is affine, so the
        # band minimum is at one of the strip's 4 corners.
        wp_f = jnp.float32(nb * lb - 1)
        y0 = jnp.float32(1.0) * (ss * t)  # ss may be a python int
        y1 = y0 + jnp.float32(t - 1)
        cor = [m3 * ddx + m4 * ddy + m5
               for ddx in (jnp.float32(0.0), wp_f) for ddy in (y0, y1)]
        rmin = jnp.floor(
            jnp.minimum(jnp.minimum(cor[0], cor[1]),
                        jnp.minimum(cor[2], cor[3]))
        ).astype(jnp.int32) - 1  # 1-ulp guard vs the per-lane fy eval
        if cubic:
            rmin = rmin - 1  # cubic taps reach one row above floor(fy)
        r = jnp.minimum((jnp.clip(rmin, 0, None) // 8) * 8, h_in - rbh)
        return pl.multiple_of(r, 8)

    if stream:
        band_hbm, sem = scratch
        cg = pl.program_id(0)
        step = cg * ns + s
        n_total = pl.num_programs(0) * ns

        def dma(slot, stp):
            cgi = stp // ns
            r0r = strip_r0row(stp % ns)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(cgi * cs, cs), pl.ds(r0r, rbh), :],
                band_hbm.at[slot],
                sem.at[slot],
            )

        @pl.when(step == 0)
        def _():
            dma(0, 0).start()

        @pl.when(step + 1 < n_total)
        def _():
            dma((step + 1) % 2, step + 1).start()

        dma(step % 2, step).wait()
        r0_row = strip_r0row(s)

    # ---- strip-wide coordinate plane (hoisted; round 5) --------------
    # Round-4 ran the whole coordinate/weight chain per lane-block on
    # (1, t*lb) vectors — ~35 serial VPU ops at 1/8 sublane utilization,
    # nb times per strip.  The ablation probe (warp_probe5.py) showed
    # this chain was 78% of the kernel (0.185 of 0.236 ms at the 1080p
    # ladder row) while the selection dots were ~0.02 ms.  The chain is
    # identical math for every block, so it now runs ONCE per strip on
    # (nb, t*lb) arrays (full sublanes, one dependency chain); blocks
    # slice out their row.
    #
    # NOTE on determinism: under interpret mode XLA:CPU lowers this
    # with fast-math FMA contraction at the LLVM level (HLO
    # optimization_barrier does not reach it), so a vmapped and a
    # plain evaluation can differ by 1 ulp of fx — which flips a
    # Q11 weight when (1-ax)*2048 lands exactly on a half step.
    # On device, Mosaic compiles one deterministic program for
    # both (vmap only adds a grid dimension).
    bi = jax.lax.broadcasted_iota(jnp.int32, (nb, t * lb), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (nb, t * lb), 1)
    trow_f = (jc // lb).astype(jnp.float32)
    lane_f = ((bi * lb) + (jc % lb)).astype(jnp.float32)
    dy = (s * t).astype(jnp.float32) + trow_f
    dd = jax.lax.broadcasted_iota(jnp.int32, (rh, t * lb), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (kw, t * lb), 0)
    fdt = jnp.bfloat16

    fx = jnp.clip(m0 * lane_f + m1 * dy + m2, -1e6, 1e6)
    fy = jnp.clip(m3 * lane_f + m4 * dy + m5, -1e6, 1e6)

    # Anchor the fractional weights to the floored integer coords —
    # XLA may materialize fx/fy twice with different FMA contraction,
    # and an inconsistent (sy, ay) pair around integer boundaries
    # selects the wrong source row outright.
    if nearest:
        # Single-tap: round half-up like OpenCV's fixed-point
        # (X0 + 512) >> 10 nearest warp; degenerate 1-tap weights.
        sx = jnp.floor(fx + 0.5).astype(jnp.int32)
        sy = jnp.floor(fy + 0.5).astype(jnp.int32)
        wx = wy = (jnp.float32(1.0),)
        k0 = 0
    elif cubic:
        # 4x4 A=-0.75 taps at sx-1..sx+2 / sy-1..sy+2 (k0 = -1).
        sx = jnp.floor(fx).astype(jnp.int32)
        sy = jnp.floor(fy).astype(jnp.int32)
        ax = jnp.clip(fx - sx.astype(jnp.float32), 0.0, 1.0)
        ay = jnp.clip(fy - sy.astype(jnp.float32), 0.0, 1.0)
        wx = _cubic_coefs(ax)
        wy = _cubic_coefs(ay)
        k0 = -1
    else:
        sx = jnp.floor(fx).astype(jnp.int32)
        sy = jnp.floor(fy).astype(jnp.int32)
        ax = jnp.clip(fx - sx.astype(jnp.float32), 0.0, 1.0)
        ay = jnp.clip(fy - sy.astype(jnp.float32), 0.0, 1.0)
        if u8:
            wx0 = _quantize_q11(1.0 - ax)
            wy0 = _quantize_q11(1.0 - ay)
        else:
            wx0, wy0 = 1.0 - ax, 1.0 - ay
        wx = (wx0, 1.0 - wx0)
        wy = (wy0, 1.0 - wy0)
        k0 = 0

    ntx, nty = len(wx), len(wy)
    # Per-tap image-bounds validity (OpenCV BORDER_CONSTANT).
    okdt = jnp.int32 if int_h else jnp.float32
    x_ok = tuple(
        ((sx + k0 + k >= 0) & (sx + k0 + k <= w_in - 1)).astype(okdt)
        for k in range(ntx)
    )
    y_ok = tuple(
        ((sy + k0 + j >= 0) & (sy + k0 + j <= h_in - 1)).astype(okdt)
        for j in range(nty)
    )
    if int_h and not nearest:
        # Q11 integer weights, identical to the f32-dyadic
        # _quantize_q11 grid (wq = floor(w*2048 + 0.5)).
        wqx0 = jnp.floor((1.0 - ax) * _COEF_SCALE + 0.5).astype(
            jnp.int32)
        wqx = (wqx0, 2048 - wqx0)
        wqy0 = jnp.floor((1.0 - ay) * _COEF_SCALE + 0.5).astype(
            jnp.int32)
        wqy = (wqy0, 2048 - wqy0)

    # Hoisted weight*validity products and border terms (per strip).
    if int_h and not nearest:
        wqe_all = [wqx[k] * x_ok[k] for k in range(2)]
    if int_v:
        if nearest:
            okq_all = x_ok[0] * y_ok[0]
        else:
            wqye_all = [wqy[j] * y_ok[j] for j in range(2)]
            if bvq:
                bfq_all = ((1 << 22)
                           - (wqe_all[0] + wqe_all[1])
                           * (wqye_all[0] + wqye_all[1])) * bvq
    else:
        wxv_all = [wx[k] * x_ok[k] for k in range(ntx)]
        wyv_all = [wy[j] * y_ok[j] for j in range(nty)]
        wsum = sum(wxv_all) * sum(wyv_all)
        backfill_all = (1.0 - wsum) * jnp.float32(bv)

    def _row(a):
        """Slice a hoisted (nb, t*lb) plane down to block b's row (the
        enclosing loop binds ``_b``); scalar weights pass through."""
        return a[_b : _b + 1] if getattr(a, "ndim", 0) == 2 else a

    # Per-block source windows from the affine map's corner extremes —
    # scalar math on the scalar unit, replacing the round-4 per-block
    # lane min-reductions.  The -1 guard absorbs any 1-ulp disagreement
    # between this scalar corner evaluation and the vectorized per-lane
    # fx/fy (same expression, possibly different FMA contraction); the
    # planner's widened margins (round 5) account for it.
    y0c = (s * t).astype(jnp.float32)
    y1c = y0c + jnp.float32(t - 1)
    half = 0.5 if nearest else 0.0

    def _windows(b):
        x0c = jnp.float32(b * lb)
        x1c = jnp.float32(b * lb + lb - 1)
        fxc = [jnp.clip(m0 * xx + m1 * yy + m2 + half, -1e6, 1e6)
               for xx in (x0c, x1c) for yy in (y0c, y1c)]
        fyc = [jnp.clip(m3 * xx + m4 * yy + m5 + half, -1e6, 1e6)
               for xx in (x0c, x1c) for yy in (y0c, y1c)]
        sxm = jnp.floor(
            jnp.minimum(jnp.minimum(fxc[0], fxc[1]),
                        jnp.minimum(fxc[2], fxc[3]))
        ).astype(jnp.int32) - 1
        sym = jnp.floor(
            jnp.minimum(jnp.minimum(fyc[0], fyc[1]),
                        jnp.minimum(fyc[2], fyc[3]))
        ).astype(jnp.int32) - 1
        c1 = jnp.minimum(jnp.maximum(sxm + k0, 0), w_pad - (kw - 1))
        c_al = jnp.minimum((c1 // 128) * 128, w_pad - 256)
        c_al = pl.multiple_of(c_al, 128)
        d = c1 - c_al
        syc_min = jnp.clip(sym + k0, 0, h_in - 1)
        if stream:
            r0 = jnp.minimum((syc_min // 8) * 8, h_in - rh)
            r0 = jnp.maximum(r0, r0_row)
            off = pl.multiple_of(r0 - r0_row, 8)
        else:
            r0 = jnp.minimum((syc_min // 8) * 8, h_pad - rh)
            r0 = pl.multiple_of(r0, 8)
            off = None
        return c1, c_al, d, r0, off

    accs = [[] for _ in range(cs)]
    for _b in range(nb):
        b = _b
        c1, c_al, d, r0, off = _windows(b)

        def load(ci):
            if stream:
                blk = band_hbm[step % 2, ci, pl.ds(off, rh),
                               pl.ds(c_al, 256)]
            else:
                blk = src_ref[ci, pl.ds(r0, rh), pl.ds(c_al, 256)]
            if u8:
                return blk.astype(jnp.int32)
            return blk

        band256 = (
            load(0) if cs == 1
            else jnp.concatenate([load(ci) for ci in range(cs)], axis=0)
        )
        # ONE rolled window serves both x taps (round 4; the round-3
        # kernel rolled twice — a dynamic lane rotate is a multi-stage
        # permute, so the second roll cost more than the extra
        # iota-compare field that replaces it).  band[k] = src col
        # c1 + k, in i32 (u8 widen; dynamic rotate is 32-bit only) or
        # f32.
        band = pltpu.roll(band256, (256 - d) % 256, 1)[:, :kw]

        sx_rel = _row(sx) - c1
        sy_rel = _row(sy) - r0
        # One 0/1 selection field per x tap on the one band (keys
        # sx_rel + k0 + k; an out-of-window key — e.g. sx_rel = -1 at
        # the left edge — simply matches nothing, and that tap's
        # weight is already zeroed).  The window's span margin keeps
        # the roll's wrap column unselectable by every field.
        if int_h:
            # Integer digit dots (see the int_path note above): the
            # band is offset to i8 range (the -128 shift is corrected
            # exactly through the fields' column sums), the Q11 weights
            # ride the fields as hi/lo int8 digits, and H comes out as
            # the EXACT i32 weighted horizontal lerp sum_k wq_k*p_k.
            band_i8 = (band - 128).astype(jnp.int8)
            if nearest:
                xo0 = _row(x_ok[0])
                F0 = jnp.where(cc == sx_rel, xo0, 0).astype(jnp.int8)
                H = (
                    jnp.dot(band_i8, F0,
                            preferred_element_type=jnp.int32)
                    + 128 * xo0
                )
            else:
                wqe = [_row(w) for w in wqe_all]
                Fhi = (
                    jnp.where(cc == sx_rel, wqe[0] >> 6, 0)
                    + jnp.where(cc == sx_rel + 1, wqe[1] >> 6, 0)
                ).astype(jnp.int8)
                Flo = (
                    jnp.where(cc == sx_rel, wqe[0] & 63, 0)
                    + jnp.where(cc == sx_rel + 1, wqe[1] & 63, 0)
                ).astype(jnp.int8)
                dhi = jnp.dot(band_i8, Fhi,
                              preferred_element_type=jnp.int32)
                dlo = jnp.dot(band_i8, Flo,
                              preferred_element_type=jnp.int32)
                H = (dhi << 6) + dlo + 128 * (wqe[0] + wqe[1])
            if not int_v:
                # H <= 255*2048*2 < 2^24: the f32 image of the exact
                # integer lerp loses nothing; vertical stays f32.
                Hf = H.astype(jnp.float32) * (
                    jnp.float32(1.0) if nearest
                    else jnp.float32(1.0 / 2048.0))
        elif fold:
            # Q11 weights folded into the selection fields as bf16
            # hi/lo halves: an 11-significant-bit dyadic splits EXACTLY
            # into two bf16 terms (top 8 + bottom 3 bits), the u8 band
            # is bf16-exact, and the dot accumulates in f32 below 2^20
            # — so Hf is the exact Q11 horizontal lerp, from the same
            # two bf16 dots the per-tap path spent on raw sums, while
            # the vertical stage now reduces ONE plane instead of two.
            wxe = [_row(w) for w in wxv_all]
            F = jnp.where(cc == sx_rel, wxe[0], 0.0)
            F = F + jnp.where(cc == sx_rel + 1, wxe[1], 0.0)
            Fh = F.astype(fdt)
            Fl = (F - Fh.astype(jnp.float32)).astype(fdt)
            bb = band.astype(fdt)
            Hf = (
                jnp.dot(bb, Fh, preferred_element_type=jnp.float32)
                + jnp.dot(bb, Fl, preferred_element_type=jnp.float32)
            )
        elif foldf:
            # f32 fold3: F carries the validity-zeroed tap weights at
            # their key columns; F and the band each split hi/lo bf16.
            # (bh+bl)(Fh+Fl) ≈ bh·Fh + bh·Fl + bl·Fh — the dropped
            # bl·Fl term is ~2^-32 relative, far under the 2^-16 class
            # of the splits themselves.  3 dots for linear (pair: 4)
            # and cubic (pair: 8); vertical reduces ONE plane.
            wxe = [_row(w) for w in wxv_all]
            F = jnp.where(cc == sx_rel + k0, wxe[0], 0.0)
            for k in range(1, ntx):
                F = F + jnp.where(cc == sx_rel + k0 + k, wxe[k], 0.0)
            Fh = F.astype(fdt)
            Fl = (F - Fh.astype(jnp.float32)).astype(fdt)
            bh = band.astype(fdt)
            bl = (band - bh.astype(jnp.float32)).astype(fdt)
            Hf = (
                jnp.dot(bh, Fh, preferred_element_type=jnp.float32)
                + jnp.dot(bh, Fl, preferred_element_type=jnp.float32)
                + jnp.dot(bl, Fh, preferred_element_type=jnp.float32)
            )
        else:
            Gs = [(cc == sx_rel + k0 + k).astype(fdt)
                  for k in range(ntx)]
        if int_h or fold or foldf:
            pass
        elif u8:
            bb = band.astype(fdt)  # u8-derived i32: exact in bf16
            ps = [jnp.dot(bb, g, preferred_element_type=jnp.float32)
                  for g in Gs]
        elif nearest:
            # Single-tap copy semantics must be EXACT: three-term bf16
            # split (8+8+8 bits covers f32's 24-bit significand).
            bh = band.astype(fdt)
            r1 = band - bh.astype(jnp.float32)
            bm = r1.astype(fdt)
            bl = (r1 - bm.astype(jnp.float32)).astype(fdt)
            p0 = jnp.dot(bh, Gs[0], preferred_element_type=jnp.float32)
            p0 += jnp.dot(bm, Gs[0], preferred_element_type=jnp.float32)
            p0 += jnp.dot(bl, Gs[0], preferred_element_type=jnp.float32)
            ps = [p0]
        else:
            # Two-term bf16 split (~16 of 24 mantissa bits — exact for
            # u8/f16-derived values, ~2^-16 relative otherwise; see
            # module docstring).  Two bf16 passes per field.
            bh = band.astype(fdt)
            bl = (band - bh.astype(jnp.float32)).astype(fdt)
            ps = [
                jnp.dot(bh, g, preferred_element_type=jnp.float32)
                + jnp.dot(bl, g, preferred_element_type=jnp.float32)
                for g in Gs
            ]

        if int_v:
            # Integer vertical: one Q11 (Q0 for nearest) weight field,
            # one i32 multiply+reduce per channel, `>> 22` truncation —
            # the reference's exact fixed-point arithmetic
            # (warp_affine_naive.cpp:50-54).  No overflow: V <=
            # 2048 * 255*2048 < 2^31, and the border backfill term is
            # complementary ((2^22 - wsum_q)*bv, total <= 255*2^22).
            if nearest:
                wvq = jnp.where(dd == sy_rel, _row(y_ok[0]), 0)
                shift = 0
                bfq = (1 - _row(okq_all)) * bvq if bvq else 0
            else:
                wqye = [_row(w) for w in wqye_all]
                wvq = (jnp.where(dd == sy_rel, wqye[0], 0)
                       + jnp.where(dd == sy_rel + 1, wqye[1], 0))
                shift = 22
                bfq = _row(bfq_all) if bvq else 0
        else:
            backfill = _row(backfill_all)
            # Vertical tap select as one iota-compare weight field —
            # shared by every channel; one VPU multiply+reduce per
            # channel.
            wv = jnp.where(dd == sy_rel + k0, _row(wyv_all[0]), 0.0)
            for j in range(1, nty):
                wv = wv + jnp.where(dd == sy_rel + k0 + j,
                                    _row(wyv_all[j]), 0.0)

        u8out = u8 and _STORE not in ("i32rows", "rev8", "flati32")
        for ci in range(cs):
            rs = slice(ci * rh, (ci + 1) * rh)
            if int_v:
                V = jnp.sum(wvq * H[rs], axis=0, keepdims=True)
                acc = jnp.clip((V + bfq) >> shift if shift else V + bfq,
                               0, 255)
                if u8out:
                    acc = acc.astype(jnp.uint8)
            elif foldf:
                # x weights already inside Hf; f32 output, no clip.
                acc = backfill + jnp.sum(wv * Hf[rs], axis=0,
                                         keepdims=True)
            elif int_h or fold:
                # x weights (and their Q11 scaling) are already inside
                # Hf; one f32 multiply+reduce per channel.
                acc = backfill + jnp.sum(wv * Hf[rs], axis=0,
                                         keepdims=True)
                acc = jnp.clip(
                    jnp.floor(acc + (0.5 if nearest else 1e-4)), 0, 255
                ).astype(jnp.int32)
                if u8out:
                    acc = acc.astype(jnp.uint8)
            else:
                # x weights applied AFTER the vertical reduce (they are
                # constant over dd).
                acc = backfill
                for k in range(ntx):
                    sk = jnp.sum(wv * ps[k][rs], axis=0, keepdims=True)
                    acc = acc + _row(wxv_all[k]) * sk
                if u8:
                    if cubic or nearest:
                        # No vacv fixed-point path for these modes:
                        # match the jnp route's OpenCV-style half-up
                        # rounding.
                        acc = jnp.clip(jnp.floor(acc + 0.5), 0, 255)
                    else:
                        # Q22 truncation; no direct f32->u8 cast on
                        # Mosaic.
                        acc = jnp.clip(jnp.floor(acc + 1e-4), 0, 255)
                    acc = acc.astype(jnp.int32)
                    if u8out:
                        acc = acc.astype(jnp.uint8)
            if _STORE in ("flat", "flati32"):
                # ONE full-lane store per channel-block; _call
                # untangles the (nb, t) lane order with one XLA
                # transpose.  (Loses on the out-block DMA: a
                # (1, t*wp) block is sublane-masked end to end.)
                out_ref[ci, 0, :, b * t * lb : (b + 1) * t * lb] = acc
            elif _STORE == "rev8":
                # ONE (1, t*lb) store per channel-block into a
                # revisiting 8-strip block: full-lane store at a
                # dynamic sublane row (s % 8), and the block's (8,
                # t*wp) shape gives the copy-out DMA clean (8, 128)
                # i32/f32 tiles.  _call untangles the lane order.
                out_ref[ci, pl.ds(s % 8, 1),
                        b * t * lb : (b + 1) * t * lb] = acc
            else:
                accs[ci].append(acc)

    if _STORE not in ("flat", "flati32", "rev8"):
        # Store stage (round 5).  The round-4 kernel stored t sub-lane
        # (1, lb) slices per channel-block — 48 masked stores per
        # block, measured at HALF the kernel runtime (warp_probe6.py
        # onewrite: 0.222 -> 0.116 ms).  Stores run as a separate
        # stage after the block loop so they never serialize with a
        # block's compute chain.  (A lane-concat "pair" merge to
        # 128-lane stores was tried and is unsupported by Mosaic:
        # "result/input offset mismatch on non-concat dimension".)
        for ci in range(cs):
            for b0 in range(nb):
                a = accs[ci][b0]
                for trow in range(t):
                    out_ref[ci, trow, b0 * lb : (b0 + 1) * lb] = a[
                        0, trow * lb : (trow + 1) * lb]


@functools.partial(
    jax.jit,
    static_argnames=("m", "h_out", "w_out", "u8", "bv", "interpret",
                     "allow_stream", "interp"),
)
def _call(planes, *, m, h_out, w_out, u8, bv, interpret, allow_stream,
          interp="linear"):
    c, h_in, w_in = planes.shape
    itemsize = 1 if u8 else 4
    plan = _plan(np.asarray(m).reshape(2, 3), c, h_in, w_in, h_out,
                 w_out, itemsize, allow_stream, interp)
    t, lb, rh = plan["t"], plan["lb"], plan["rh"]
    nb, wp, cs = plan["nb"], plan["wp"], plan["cs"]
    h_pad, w_pad, rbh = plan["h_pad"], plan["w_pad"], plan["rbh"]
    stream = rbh > 0

    if not stream and (h_pad, w_pad) != (h_in, w_in):
        planes = jnp.pad(
            planes, ((0, 0), (0, h_pad - h_in), (0, w_pad - w_in))
        )

    ns = pl.cdiv(h_out, t)
    grid = (c // cs, ns)
    kernel = functools.partial(
        _kernel, m=m, h_in=h_in, w_in=w_in, t=t, lb=lb, rh=rh, nb=nb,
        cs=cs, h_pad=h_pad, w_pad=w_pad, rbh=rbh, u8=u8, bv=bv, ns=ns,
        interp=interp, kw=plan["kw"],
    )
    dtype = jnp.uint8 if u8 else jnp.float32
    if stream:
        in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)]
        scratch_shapes = [
            pltpu.VMEM((2, cs, rbh, w_pad), planes.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        in_specs = [
            pl.BlockSpec(
                (cs, h_pad, w_pad), lambda ci, s: (ci, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        scratch_shapes = []
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (cs, 1, 1, t * wp), lambda ci, s: (ci, s, 0, 0),
            memory_space=pltpu.VMEM,
        ) if _STORE in ("flat", "flati32") else pl.BlockSpec(
            (cs, 8, t * wp), lambda ci, s: (ci, s // 8, 0),
            memory_space=pltpu.VMEM,
        ) if _STORE == "rev8" else pl.BlockSpec(
            (cs, t, wp), lambda ci, s: (ci, s, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (c, ns, 1, t * wp) if _STORE in ("flat", "flati32")
            else (c, pl.cdiv(ns, 8) * 8, t * wp) if _STORE == "rev8"
            else (c, ns * t, wp),
            jnp.int32 if u8 and _STORE in ("i32rows", "rev8", "flati32")
            else dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(planes)
    if _STORE == "rev8":
        out = out[:, :ns]
    if _STORE in ("flat", "flati32", "rev8"):
        # Untangle the (block, trow) lane order: one XLA transpose.
        out = out.reshape(c, ns, nb, t, lb).transpose(0, 1, 3, 2, 4)
        out = out.reshape(c, ns * t, wp)
    if out.dtype != dtype:
        out = out.astype(dtype)
    return out[:, :h_out, :w_out]


def warp_affine_pallas(planes, minv, h_out: int, w_out: int, *, u8: bool,
                       border_value: float, interp: str = "linear",
                       nearest: bool = False):
    """Warp (c, h, w) planes (u8 or f32) with inverse matrix ``minv``.

    Returns (c, h_out, w_out) in the input's dtype (u8 via Q22
    truncation for linear; OpenCV half-up rounding for nearest/cubic,
    matching the jnp route).  ``interp``: "linear" | "nearest"
    (single-tap, exact — 3-term bf16 split for f32) | "cubic" (4x4
    A=-0.75 taps).  Caller must have checked ``warp_supported`` with
    the same ``interp``.
    """
    if nearest:  # legacy bool form
        interp = "nearest"
    m = tuple(float(v) for v in np.asarray(minv, np.float32).ravel())
    config.record_kernel("warp_affine")
    return _call(
        planes, m=m, h_out=h_out, w_out=w_out, u8=u8,
        bv=float(border_value), interpret=config.pallas_interpret(),
        allow_stream=not under_vmap(planes), interp=interp,
    )
