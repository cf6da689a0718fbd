"""Pallas 2-D correlation kernel for match_template.

The XLA formulation (``ops/match_template.py:_corr``) materializes a
``(C*th, rows*W)`` vertical unfold in HBM — a th-fold read/write
amplification of the image (~160 MB of traffic for a 32x32 template
over 640x360, measured 0.67 ms).  This kernel keeps the image planes
resident in VMEM and builds its MXU operand from three CONTIGUOUS
row-block slices per strip, so the image is read from HBM exactly
once:

* **Strip grid**: each step produces R=8 output rows x the full padded
  width.
* **Shifted-template stack**: the dot's M axis carries all (dx, r)
  pairs at once — ``K2R[(dx*R + r), (ci, dyx)] = k[ci, dyx - r, dx]``
  over ``dyx in [0, th+R-1)``.  The K-axis operand for a strip is then
  just ``planes[ci, s*R : s*R + th+R-1, :]`` per channel — aligned
  contiguous slices, no per-row extracts (the row shift ``r`` lives in
  the template stack, not the image operand).
* **Diagonal epilogue**: ``resp[r, x'] = sum_dx acc[dx*R + r, x'+dx]``
  — the (dx, r) row ordering makes each dx-group a CONTIGUOUS aligned
  (R, w) slice; tw static lane-rolls + adds finish the correlation.
  Rolled wrap-around columns land past ``w' - 1`` and are sliced off.
* **Exactness**: template terms are a 3-term bf16 split (24-bit
  coverage -> f32-faithful); u8-derived images are exact in one bf16
  operand, f32 images add a second (hi/lo) image split — the round-3
  lesson that XLA's skinny bf16 dots are NOT f32-accumulated does not
  apply to MXU dots inside Mosaic kernels, which are.

Parity target: cv::matchTemplate's correlation core
(``/root/reference/src/cv/match_template.cpp:13-61`` wraps OpenCV; the
mode formulas live in ``ops/match_template.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config

_R = 8                       # output rows per strip
_LANE = 128
_PLANES_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _ceil_to(x: int, n: int) -> int:
    return ((x + n - 1) // n) * n


def corr_supported(c: int, h: int, w: int, th: int, tw: int) -> bool:
    """Can the resident-image correlation kernel run this config?"""
    if th < 1 or tw < 1 or th > h or tw > w:
        return False
    if tw > _LANE or th > 128 or c > 8:
        return False
    h_out = h - th + 1
    ns = -(-h_out // _R)
    thp = _ceil_to(th + _R - 1, 8)
    h_pad = max(_ceil_to(h, 8), (ns - 1) * _R + thp)
    w_pad = _ceil_to(w, _LANE)
    if c * h_pad * w_pad * 4 > _PLANES_BUDGET:
        return False
    return True


def _kernel(planes_ref, k2r_ref, out_ref, *, c, thp, tw, w_pad, w_out,
            img_terms, kt):
    s = pl.program_id(0)
    b0 = jnp.concatenate(
        [planes_ref[ci, pl.ds(s * _R, thp), :] for ci in range(c)],
        axis=0,
    )  # (c*thp, w_pad) f32
    bh = b0.astype(jnp.bfloat16)
    acc = jnp.zeros((tw * _R, w_pad), jnp.float32)
    for t in range(kt):
        acc += jnp.dot(k2r_ref[t], bh, preferred_element_type=jnp.float32)
    if img_terms == 2:
        bl = (b0 - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        # Drop K2*Bl (~2^-32 relative); keep K0/K1 x Bl.
        for t in range(min(kt, 2)):
            acc += jnp.dot(k2r_ref[t], bl,
                           preferred_element_type=jnp.float32)
    resp = acc[0 : _R, :]
    for dx in range(1, tw):
        blk = acc[dx * _R : (dx + 1) * _R, :]
        resp += pltpu.roll(blk, w_pad - dx, 1)
    out_ref[...] = resp[:, :w_out]


@functools.partial(
    jax.jit,
    static_argnames=("c", "h_pad", "w_pad", "th", "tw", "h_out", "w_out",
                     "img_terms", "kt", "interpret"),
)
def _call(planes, k2r, *, c, h_pad, w_pad, th, tw, h_out, w_out,
          img_terms, kt, interpret):
    thp = _ceil_to(th + _R - 1, 8)
    ns = -(-h_out // _R)
    kern = functools.partial(
        _kernel, c=c, thp=thp, tw=tw, w_pad=w_pad, w_out=w_out,
        img_terms=img_terms, kt=kt,
    )
    out = pl.pallas_call(
        kern,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec(
                (c, h_pad, w_pad), lambda s: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_R, w_out), lambda s: (s, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((ns * _R, w_out), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(planes, k2r)
    return out[:h_out]


def _build_k2r(k, thp: int, kt: int):
    """(kt, tw*R, c*thp) bf16 shifted-template stack from k (c, th, tw).

    Row (dx*R + r), K column (ci*thp + dyx) holds k[ci, dyx - r, dx];
    kt-term bf16 split along a new leading axis.
    """
    c, th, tw = k.shape
    rows = []
    for r in range(_R):
        p = jnp.pad(k, ((0, 0), (r, thp - th - r), (0, 0)))  # (c, thp, tw)
        rows.append(jnp.transpose(p, (2, 0, 1)).reshape(tw, c * thp))
    k2r = jnp.stack(rows, axis=1).reshape(tw * _R, c * thp)
    terms = []
    rem = k2r
    for _ in range(kt):
        hi = rem.astype(jnp.bfloat16)
        terms.append(hi)
        rem = rem - hi.astype(jnp.float32)
    return jnp.stack(terms)


def corr_pallas(x, k, *, exact_img: bool):
    """Valid 2-D cross-correlation of x (1, C, H, W) f32 with template
    k (1, C, th, tw) f32 -> (H-th+1, W-tw+1) f32.

    ``exact_img``: the image values are bf16-exact (u8-derived); f32
    images add a hi/lo image split.  Caller must have checked
    :func:`corr_supported`.
    """
    _, c, h, w = x.shape
    th, tw = k.shape[2], k.shape[3]
    h_out, w_out = h - th + 1, w - tw + 1
    ns = -(-h_out // _R)
    thp = _ceil_to(th + _R - 1, 8)
    h_pad = max(_ceil_to(h, 8), (ns - 1) * _R + thp)
    w_pad = _ceil_to(w, _LANE)
    planes = x[0]
    if (h_pad, w_pad) != (h, w):
        planes = jnp.pad(planes, ((0, 0), (0, h_pad - h), (0, w_pad - w)))
    kt = 3
    k2r = _build_k2r(k[0], thp, kt)
    config.record_kernel("match_corr")
    return _call(
        planes, k2r, c=c, h_pad=h_pad, w_pad=w_pad, th=th, tw=tw,
        h_out=h_out, w_out=w_out, img_terms=1 if exact_img else 2,
        kt=kt, interpret=config.pallas_interpret(),
    )
