"""Probe: int8 MXU dots in Pallas on v5e — supported? rate vs bf16?

The warp kernel's horizontal selection dots are bf16 (197 TFLOP/s peak
on v5e); the u8 path's operands are genuinely integer (u8 band, Q11
weight digits), so if Mosaic lowers ``jnp.dot(i8, i8, preferred=i32)``
to the MXU's int8 mode (394 TOPS peak) the selection stage halves.

Run on the real TPU:  python -m benchmarks.probe_i8
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vacv_tpu.utils.perf import device_time


def _mk(dtype, acc, M, K, N, reps):
    def kernel(a_ref, b_ref, o_ref):
        # a_ref is (M + reps, K): each rep dots a distinct static row
        # window, so Mosaic cannot CSE the reps into one dot.
        acc_v = jnp.zeros((M, N), acc)
        b = b_ref[:]
        for r in range(reps):
            acc_v = acc_v + jnp.dot(
                a_ref[r : r + M, :], b, preferred_element_type=acc
            )
        o_ref[:] = acc_v

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), acc),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    def step(i, a2, b):
        # anti-hoist: slide a 1-row window over an (M+reps+1, K) operand
        a = jax.lax.dynamic_slice(a2, (i % 2, 0), (M + reps, K))
        return f(a, b)

    return f, step


def main():
    rng = np.random.default_rng(0)
    M, K, N = 96, 128, 2048
    reps = 64
    flops = 2 * M * K * N * reps

    for name, dt, acc in [
        ("bf16->f32", jnp.bfloat16, jnp.float32),
        ("i8->i32", jnp.int8, jnp.int32),
        ("u8xi8->i32", None, jnp.int32),  # mixed: band u8-ish as i8
    ]:
        if name == "u8xi8->i32":
            continue  # covered by i8 case
        a = jnp.asarray(rng.integers(-100, 100, (M + reps, K)), dt)
        a2 = jnp.asarray(rng.integers(-100, 100, (M + reps + 1, K)), dt)
        b = jnp.asarray(rng.integers(-2, 3, (K, N)), dt)
        try:
            f, step = _mk(dt, acc, M, K, N, reps)
            out = np.asarray(f(a, b))
            an = np.asarray(a, np.float64)
            bn = np.asarray(b, np.float64)
            want = sum(an[r : r + M] @ bn for r in range(reps))
            ok = np.allclose(out, want, rtol=1e-2)
            sec = device_time(step, a2, b)
            print(f"{name}: ok={ok}  {sec*1e6:.1f} us  "
                  f"{flops/sec*1e-12:.1f} Top/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")

    # K sweep at the kernel's dot shape: does a narrower contraction
    # window actually cost less, or does Mosaic pad K back to 128?
    for Ks in (32, 64, 96, 128):
        M, N = 96, 1024
        a = jnp.asarray(rng.integers(-100, 100, (M + reps, Ks)), jnp.int8)
        a2 = jnp.asarray(
            rng.integers(-100, 100, (M + reps + 1, Ks)), jnp.int8)
        b = jnp.asarray(rng.integers(-2, 3, (Ks, N)), jnp.int8)
        try:
            f, step = _mk(jnp.int8, jnp.int32, M, Ks, N, reps)
            sec = device_time(step, a2, b)
            fl = 2 * M * Ks * N * reps
            print(f"i8 K={Ks}: {sec*1e6:.1f} us  {fl/sec*1e-12:.1f} Top/s")
        except Exception as e:  # noqa: BLE001
            print(f"i8 K={Ks}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")

    # Bigger, MXU-saturating shapes for honest peak comparison.
    for name, dt, acc in [
        ("bf16 1024^3", jnp.bfloat16, jnp.float32),
        ("i8 1024^3", jnp.int8, jnp.int32),
    ]:
        M = K = N = 1024
        reps2 = 32
        a2 = jnp.asarray(rng.integers(-100, 100, (M + reps2 + 1, K)), dt)
        b = jnp.asarray(rng.integers(-2, 3, (K, N)), dt)
        try:
            f, step = _mk(dt, acc, M, K, N, reps2)
            sec = device_time(step, a2, b)
            fl = 2 * M * K * N * reps2
            print(f"{name}: {sec*1e6:.1f} us  {fl/sec*1e-12:.1f} Top/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
