"""Pallas fused dtype-convert + mean/stddev + normalize kernel.

TPU redesign of the reference's three separate linear passes
(``u8_2_f32_neon`` at ``tensor.cpp:297-347``, then the two-pass
mean/variance at ``normalize_naive.cpp:7-72``, then the scale pass at
``normalize_naive.cpp:74-90``).  That chain reads the pixel data from
memory four times (once as u8, three times as f32).  Here the whole
image sits in VMEM once: the kernel widens u8→f32, computes the
per-channel moments as a hierarchical VPU reduction, and writes the
normalized f32 planes — a single HBM read of 1 byte/px and a single
write of 4 bytes/px, which is the bandwidth speed-of-light for the
fused op.

Falls back to the jnp path for images whose f32 working set exceeds
the VMEM budget.
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

# Leave headroom below the ~16 MB/core VMEM for double-buffering etc.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _kernel(x_ref, out_ref):
    # One channel plane per grid step, 2-D block (Mosaic's vector
    # layouts are 2-D; rank-3 reductions crash its reshape inference).
    # No direct u8->f32 cast on Mosaic; widen via i32 (free on the VPU).
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # (h, w)
    n = x.shape[0] * x.shape[1]
    mean = jnp.sum(x) / n
    # Two-pass variance (free: x already lives in VMEM) — avoids the
    # E[x²]−μ² cancellation on low-contrast images and matches the
    # reference's E[(x−μ)²] formulation bit-closely.
    d = x - mean
    var = jnp.sum(d * d) / n
    std = jnp.sqrt(var)
    out_ref[0] = d / (std + EPS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(planes, *, interpret: bool):
    c, h, w = planes.shape
    return pl.pallas_call(
        _kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
    )(planes)


def fits_vmem(shape) -> bool:
    c, h, w = shape
    # u8 in + f32 working + f32 out
    return c * h * w * (1 + 4 + 4) <= _VMEM_BUDGET_BYTES


def normalize_fused_pallas(img: Image) -> Image:
    """Self-normalize an image (mean/stddev from the image itself)."""
    data = img.data
    if img.layout == Layout.HWC:
        planes = jnp.transpose(data, (2, 0, 1))
    else:
        planes = data
    if not fits_vmem(planes.shape):
        from ..normalize import normalize_jnp

        return normalize_jnp(img)
    config.record_kernel("normalize_fused")
    out = _call(planes, interpret=config.pallas_interpret())
    if img.layout == Layout.HWC:
        out = jnp.transpose(out, (1, 2, 0))
    return img.with_data(out)
