"""Shared kernel-dispatch helpers."""
from __future__ import annotations

import os

import jax


def pallas_interpret_default() -> bool:
    """Default interpret flag for every Pallas kernel in the package.

    Interpret mode (the kernels lowered to plain XLA ops) runs on any
    backend and is the CI parity oracle; compiled Mosaic runs on TPU.
    ``MR_GNAS_PALLAS_INTERPRET=1`` forces interpret mode even on TPU —
    used by scripts/tpu_kernel_check.py to compare the SAME kernel
    compiled-vs-interpret within one session (a compiler-drift-robust
    wiring check, unlike comparing two different schedules).
    """
    if os.environ.get("MR_GNAS_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() != "tpu"


def vma_of(*arrays) -> frozenset:
    """Union of the varying-manual-axes of the given arrays.

    Inside ``jax.shard_map`` (check_vma=True, the default), every
    ``pallas_call`` out_shape must declare which mesh axes its output
    varies over — derived here from the kernel's inputs, so the same
    kernel code runs standalone (empty vma) and per-shard under a mesh.
    """
    v: frozenset = frozenset()
    for a in arrays:
        if a is None:
            continue
        try:
            t = jax.typeof(a)
        except Exception:
            continue
        v |= getattr(t, "vma", None) or frozenset()
    return v


def out_struct(shape, dtype, *from_arrays):
    """jax.ShapeDtypeStruct whose vma is inherited from ``from_arrays``."""
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma_of(*from_arrays) or None)


def match_vma(x, *refs):
    """Promote ``x`` to the union varying-manual-axes of ``refs``.

    Inside ``jax.shard_map``, a replicated (invariant) operand consumed
    by a ``custom_vjp`` kernel would get a VARYING cotangent that the
    vma checker cannot prove back to replicated — the automatic
    pvary-transpose psum only exists for regular ops. Explicitly
    ``jax.lax.pvary``-ing the operand BEFORE the custom_vjp restores it:
    pvary's transpose is exactly the psum the replicated gradient needs.
    No-op outside shard_map and for already-varying operands.
    """
    target = vma_of(*refs)
    if not target:
        return x
    missing = tuple(target - vma_of(x))
    return jax.lax.pvary(x, missing) if missing else x
