"""Tracing / profiling / device-memory observability.

Upgrades the reference's manual wall-clock + CUDA-memory probes
(search/mr_lp_search.py:248-251, utils/utils.py:134-141) to:
  * ``trace()`` — a context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory;
  * ``device_memory_stats()`` — per-device HBM usage via
    ``Device.memory_stats()``;
  * ``timed()`` — ``block_until_ready``-correct section timing (naive
    wall-clocking of dispatch, as the reference does, under-reports
    async device work).
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a section: ``with trace('runs/prof'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    """HBM stats for one device (bytes): in-use, limit, peak if exposed."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "device": str(device),
    }


@contextlib.contextmanager
def timed(sink: dict, key: str, result_holder: list | None = None):
    """Time a section, blocking on the device results placed in
    ``result_holder`` so async dispatch is not under-counted."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if result_holder:
            jax.block_until_ready(result_holder)
        sink[key] = sink.get(key, 0.0) + time.perf_counter() - t0


def nan_check(tree, name: str = "tree") -> None:
    """Raise if any leaf contains NaN/Inf (debug helper; jit-unfriendly)."""
    import jax.numpy as jnp

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                raise FloatingPointError(f"non-finite values in {name}{path}")
