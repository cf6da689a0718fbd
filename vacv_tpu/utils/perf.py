"""Wall-clock timing utilities.

Parity with ``AutoPerf`` / ``TIME_PERF`` (reference
``/root/reference/src/util/perf_util.h:7-17``): a scope timer that
writes elapsed milliseconds into a caller-provided slot.  On TPU,
dispatch is asynchronous, so correct timing must block on device
results — ``time_fn`` synchronizes via ``jax.block_until_ready``.
"""
from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def profiler_trace(logdir: str):
    """XLA/TPU profiler trace scope (SURVEY §5.1: the rebuild's
    deep-tracing mechanism, succeeding the reference's ``cudaEvent``
    instrumentation).  View with TensorBoard or xprof:

        with profiler_trace("/tmp/vacv-trace"):
            out = pipeline(batch)
            jax.block_until_ready(out)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall-clock timer (milliseconds)."""

    def __init__(self) -> None:
        self.ms = 0.0

    @contextmanager
    def scope(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.ms += (time.perf_counter() - t0) * 1e3


@contextmanager
def time_perf(out: dict, key: str = "ms"):
    """``TIME_PERF``-style scope: writes elapsed ms into ``out[key]``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        out[key] = (time.perf_counter() - t0) * 1e3


def device_time(step_fn, *args, iters: int = 32, base_iters: int = 2):
    """Honest per-iteration device time (seconds) via the loop-slope
    method.

    ``step_fn(i, *args) -> array`` runs one iteration; it MUST make the
    computation depend on the loop index ``i`` (e.g. a dynamic-slice
    offset ``i % 2``) so XLA cannot hoist it out of the loop.  We run
    ``base_iters`` and ``iters`` repetitions inside a single jitted
    ``fori_loop`` whose scalar result is fetched to the host, and return
    the slope — which cancels dispatch/transfer constants.  This is
    required on remote-tunneled TPUs where ``block_until_ready`` can
    return before execution completes; it is also more precise than
    wall-clock loops on local devices.
    """
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(k, *a):
        def body(i, c):
            out = step_fn(i, *a)
            return c + jnp.sum(out, dtype=jnp.float32)

        # k is traced -> lowers to a while loop: one compile serves all
        # repetition counts (static k provoked pathological compiles).
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    def run(k, reps):
        float(loop(k, *args))  # warm / compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    # Alternate small-K and big-K samples so slow drift in the
    # dispatch/fetch constant (typical on remote-tunneled devices)
    # affects both sides of the slope equally; keep the per-side min
    # and track jitter to detect an unresolvable slope.
    run(base_iters, 1)  # warm both compiled paths
    run(iters, 1)
    while True:
        t_small = float("inf")
        t_big = float("inf")
        jitter = 0.0
        prev_small = None
        for _ in range(3):
            s = run(base_iters, 1)
            if prev_small is not None:
                jitter = max(jitter, abs(s - prev_small))
            prev_small = s
            t_small = min(t_small, s)
            t_big = min(t_big, run(iters, 1))
        delta = t_big - t_small
        # If the measured work is buried in dispatch jitter, widen the
        # iteration gap (fast kernels on noisy links need more reps).
        if delta > 3 * jitter or iters >= 512:
            return max(delta / (iters - base_iters), 1e-9)
        iters = min(iters * 4, 512)
        run(iters, 1)  # compile/warm the wider loop


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Time ``fn(*args)`` with device synchronization.

    Returns ``(best_ms, mean_ms, last_result)``.  Warm-up iterations
    absorb jit compilation (the reference's first-call cost is malloc;
    ours is XLA compilation — excluded the same way the reference
    averages over 10 repetitions, cv_profile.cpp:14).
    """
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return min(times), sum(times) / len(times), result
