"""Pallas fused dtype-convert + mean/stddev + normalize kernel.

TPU redesign of the reference's three separate linear passes
(``u8_2_f32_neon`` at ``tensor.cpp:297-347``, then the two-pass
mean/variance at ``normalize_naive.cpp:7-72``, then the scale pass at
``normalize_naive.cpp:74-90``).  That chain reads the pixel data from
memory four times (once as u8, three times as f32).  Here the image
streams through VMEM in row chunks under a two-phase grid:

* **phase 0** reads each u8 chunk once and reduces it to per-chunk
  sufficient statistics (count n, mean, M2 = Σ(x−μ_chunk)²) held in
  SMEM — a *within-chunk two-pass* moment, so no catastrophic
  E[x²]−μ² cancellation at any image size;
* at the phase boundary the per-chunk partials merge with the parallel
  Welford/Chan update into per-channel (μ, σ) — the hierarchical
  reduction SURVEY §7.6 calls for;
* **phase 1** re-reads each u8 chunk, widens, and writes the
  normalized f32 chunk.

HBM traffic is 2 u8 reads + 1 f32 write = 6 bytes/px — within ~20% of
the fused-op speed-of-light (5 B/px) at any frame size, where the
previous whole-plane-in-VMEM kernel refused anything above ~0.4 Mpx.

Both layouts are native: CHW grids over (phase, channel, chunk) plane
rows; HWC grids over (phase, chunk) interleaved rows with lane-mod-C
masks for the per-channel moments and a lane-gathered (μ, σ) field for
the scale pass — no transpose pass on either side.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config
from ...core.image import Image
from ...core.types import Layout

EPS = 1e-6

# Per-chunk VMEM working set: u8 in + f32 widen + f32 out ≈ 9 B/px.
_CHUNK_BUDGET = 6 * 1024 * 1024


def _chunk_rows(rows: int, lanes: int) -> int:
    # u8 in + f32 widen + f32 out + hi/lo bf16 dot operands ≈ 13 B/px.
    per_row = lanes * 13
    ch = max(32, min(rows, _CHUNK_BUDGET // max(per_row, 1)))
    return -(-ch // 32) * 32 if ch < rows else rows


def _merge_partials(ns, means, m2s):
    """Chan parallel-variance merge of per-chunk (n, mean, M2)."""
    n = jnp.sum(ns)
    mu = jnp.sum(ns * means) / n
    m2 = jnp.sum(m2s) + jnp.sum(ns * jnp.square(means - mu))
    return mu, jnp.sqrt(m2 / n)


def _widen(x):
    # No direct u8→f32 cast on Mosaic; via int32 (free on the VPU).
    if x.dtype == jnp.uint8:
        return x.astype(jnp.int32).astype(jnp.float32)
    return x.astype(jnp.float32)


def _chw_kernel(x_ref, out_ref, part_ref, stat_ref, *, h, nj, chunk):
    p = pl.program_id(0)
    ci = pl.program_id(1)
    j = pl.program_id(2)
    rows_left = h - j * chunk
    rr = jax.lax.broadcasted_iota(jnp.int32, (chunk, x_ref.shape[2]), 0)
    valid = (rr < rows_left).astype(jnp.float32)

    @pl.when(p == 0)
    def _():
        x = _widen(x_ref[0]) * valid
        n = jnp.minimum(rows_left, chunk).astype(jnp.float32) * x_ref.shape[2]
        mc = jnp.sum(x) / n
        d = (x - mc) * valid
        part_ref[ci, j, 0] = n
        part_ref[ci, j, 1] = mc
        part_ref[ci, j, 2] = jnp.sum(d * d)

    @pl.when((p == 1) & (j == 0))
    def _():
        # Merge this channel's chunk partials (runs once per channel;
        # nj scalar SMEM reads — negligible next to the pixel passes).
        def body(k, acc):
            n_a, mu_a, m2_a = acc
            n_b = part_ref[ci, k, 0]
            mu_b = part_ref[ci, k, 1]
            m2_b = part_ref[ci, k, 2]
            n = n_a + n_b
            delta = mu_b - mu_a
            mu = mu_a + delta * n_b / n
            m2 = m2_a + m2_b + delta * delta * n_a * n_b / n
            return (n, mu, m2)

        n, mu, m2 = jax.lax.fori_loop(
            0, nj, body, (jnp.float32(0), jnp.float32(0), jnp.float32(0))
        )
        stat_ref[ci, 0] = mu
        stat_ref[ci, 1] = jnp.sqrt(m2 / n)

    @pl.when(p == 1)
    def _():
        x = _widen(x_ref[0])
        out_ref[0] = (x - stat_ref[ci, 0]) / (stat_ref[ci, 1] + EPS)


def _hwc_kernel(x_ref, m_ref, out_ref, part_ref, stat_ref, *, h, c, nj,
                chunk, u8_exact):
    """Interleaved-HWC kernel.  The per-channel reductions run as 0/1
    lane-selection MXU matmuls (``M[l, k] = (l % c == k)``) instead of
    per-channel masked sums — the masked form was VPU-bound (~9 full
    passes over each chunk; measured 2.7× slower than jnp at 1080p).
    Dots are Dekker-split (hi/lo bf16), exact to f32 accumulation."""
    p = pl.program_id(0)
    j = pl.program_id(1)
    lanes = x_ref.shape[1]
    rows_left = h - j * chunk
    rr = jax.lax.broadcasted_iota(jnp.int32, (chunk, lanes), 0)
    valid = (rr < rows_left).astype(jnp.float32)
    cl_row = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % c

    def csum(v, exact_bf16):
        """(chunk, lanes) → (chunk, 128) per-channel row partial sums
        via the 0/1 lane-selection matrix input (m_ref)."""
        vhi = v.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            vhi, m_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if not exact_bf16:
            vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
            s += jax.lax.dot_general(
                vlo, m_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return s

    def lane_field(scalars):
        """Spread c per-channel scalars to a (1, lanes) row."""
        row = jnp.zeros((1, lanes), jnp.float32)
        for cc in range(c):
            row = jnp.where(cl_row == cc, scalars[cc], row)
        return row

    @pl.when(p == 0)
    def _():
        xv = _widen(x_ref[:]) * valid
        n = (
            jnp.minimum(rows_left, chunk).astype(jnp.float32) * lanes / c
        )
        s = csum(xv, u8_exact)  # u8 inputs are exact in bf16
        # Full reductions of rank-2 column slices — Mosaic rejects the
        # partial-axis reduction of a 1-D lane-column extract.
        mcs = [jnp.sum(s[:, cc : cc + 1]) / n for cc in range(c)]
        d = (xv - lane_field(mcs) * valid)
        s2 = csum(d * d, False)
        for cc in range(c):  # static unroll over channels
            part_ref[cc, j, 0] = n
            part_ref[cc, j, 1] = mcs[cc]
            part_ref[cc, j, 2] = jnp.sum(s2[:, cc : cc + 1])

    @pl.when((p == 1) & (j == 0))
    def _():
        for cc in range(c):

            def body(k, acc, cc=cc):
                n_a, mu_a, m2_a = acc
                n_b = part_ref[cc, k, 0]
                mu_b = part_ref[cc, k, 1]
                m2_b = part_ref[cc, k, 2]
                n = n_a + n_b
                delta = mu_b - mu_a
                mu = mu_a + delta * n_b / n
                m2 = m2_a + m2_b + delta * delta * n_a * n_b / n
                return (n, mu, m2)

            n, mu, m2 = jax.lax.fori_loop(
                0, nj, body, (jnp.float32(0), jnp.float32(0), jnp.float32(0))
            )
            stat_ref[cc, 0] = mu
            stat_ref[cc, 1] = jnp.sqrt(m2 / n)

    @pl.when(p == 1)
    def _():
        x = _widen(x_ref[:])
        mu = lane_field([stat_ref[cc, 0] for cc in range(c)])
        sd = lane_field([stat_ref[cc, 1] for cc in range(c)])
        out_ref[:] = (x - mu) / (sd + EPS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_chw(planes, *, interpret: bool):
    c, h, w = planes.shape
    chunk = _chunk_rows(h, w)
    nj = pl.cdiv(h, chunk)
    kern = functools.partial(_chw_kernel, h=h, nj=nj, chunk=chunk)
    return pl.pallas_call(
        kern,
        grid=(2, c, nj),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, w), lambda p, ci, j: (ci, j, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        # Phase 0 parks the (unwritten) output window on block (0,0,0);
        # phase 1 revisits and writes every block with real data.
        out_specs=pl.BlockSpec(
            (1, chunk, w),
            lambda p, ci, j: (ci * p, j * p, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((c, nj, 3), jnp.float32),
            pltpu.SMEM((c, 2), jnp.float32),
        ],
        interpret=interpret,
    )(planes)


@functools.lru_cache(maxsize=16)
def _sel_matrix(lanes: int, c: int):
    """Device-resident (lanes, 128) 0/1 lane→channel selection matrix,
    built outside any trace (a lifted parameter, not an HLO literal)."""
    import numpy as np

    m = np.zeros((lanes, 128), np.float32)
    m[np.arange(lanes), np.arange(lanes) % c] = 1.0
    with jax.ensure_compile_time_eval():
        return jnp.asarray(m, jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("c", "u8_exact", "interpret"))
def _call_hwc(rows, *, c: int, u8_exact: bool, interpret: bool):
    h, lanes = rows.shape
    chunk = _chunk_rows(h, lanes)
    nj = pl.cdiv(h, chunk)
    kern = functools.partial(
        _hwc_kernel, h=h, c=c, nj=nj, chunk=chunk, u8_exact=u8_exact
    )
    return pl.pallas_call(
        kern,
        grid=(2, nj),
        in_specs=[
            pl.BlockSpec(
                (chunk, lanes), lambda p, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (chunk, lanes), lambda p, j: (j * p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((c, nj, 3), jnp.float32),
            pltpu.SMEM((c, 2), jnp.float32),
        ],
        interpret=interpret,
    )(rows, _sel_matrix(lanes, c))


def normalize_fused_pallas(img: Image) -> Image:
    """Self-normalize an image (mean/stddev from the image itself)."""
    data = img.data
    config.record_kernel("normalize_fused")
    interp = config.pallas_interpret()
    if img.layout == Layout.HWC:
        h, w, c = data.shape
        out = _call_hwc(
            data.reshape(h, w * c), c=c,
            u8_exact=data.dtype == jnp.uint8, interpret=interp,
        )
        return img.with_data(out.reshape(h, w, c))
    out = _call_chw(data, interpret=interp)
    return img.with_data(out)
