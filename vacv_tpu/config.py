"""Runtime configuration / backend selection.

The reference selects kernels at compile time via CMake flags
(``USE_NEON`` / ``USE_CUDA`` / ``USE_OPENCV``, reference
``CMakeLists.txt:8-18``) with per-call runtime fallback when a
dtype/mode is unsupported (e.g. ``resize.cpp:46-49``).  The TPU rebuild
mirrors that as a process-wide backend preference with per-call
capability fallback: ``pallas`` kernels where they exist, pure-``jnp``
XLA implementations everywhere (always available, also the fallback).
"""
from __future__ import annotations

import os
from contextlib import contextmanager

import jax

# "auto": pallas on TPU, jnp elsewhere (pallas kernels still unit-tested
#         on CPU via interpret mode).
# "pallas": force pallas kernels (interpret-mode off-TPU).
# "jnp":   force the pure-jnp reference implementations.
_BACKEND = os.environ.get("VACV_BACKEND", "auto")

_VALID = ("auto", "pallas", "jnp")


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}, got {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def default_platform() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    return default_platform() == "tpu"


def use_pallas() -> bool:
    """Should ops prefer their pallas kernel?"""
    if _BACKEND == "pallas":
        return True
    if _BACKEND == "jnp":
        return False
    return on_tpu()


def pallas_interpret() -> bool:
    """Run pallas kernels in interpreter mode (off-TPU testing)."""
    return not on_tpu()


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (benchmark CLIs call
    this so the fused-kernel compiles — minutes over a remote-tunneled
    TPU — are paid once per machine, not once per process)."""
    import os

    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


# --- kernel-path observability ------------------------------------
# Trace-time counters recording which backend actually served each op
# (the reference's analogue is its compile-time USE_NEON/USE_CUDA
# selection being visible in the binary).  Tests assert the pallas
# path is taken where promised; `kernel_count` reads, `record_kernel`
# is called by each pallas kernel entry at trace time.
_KERNEL_COUNTS: dict[str, int] = {}


def record_kernel(name: str) -> None:
    _KERNEL_COUNTS[name] = _KERNEL_COUNTS.get(name, 0) + 1


def kernel_count(name: str) -> int:
    return _KERNEL_COUNTS.get(name, 0)


@contextmanager
def backend(name: str):
    """Temporarily override the backend preference."""
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev
