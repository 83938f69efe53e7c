#!/usr/bin/env python
"""Compare segment-reduce formulations on the attached device.

The profiled train step (scripts/profile_step.py --trace) spends ~32% of
device time in scatter "custom fusions" (forward segment reductions +
backward scatter-adds of gathers) running far below HBM bandwidth. This
microbench times candidate replacements at the bench shapes, amortized
inside a jitted lax.scan (single dispatches through the axon tunnel are
unreliable — NOTES.md).

Formulations:
  xla_scatter   jax.ops.segment_sum/max (the current model path)
  pallas_csr    blocked-CSR one-hot-matmul kernel (kernels/pallas_segment)
  gather_k      degree-padded gather: out[n] = reduce_k data[idx[n, k]]
                (scatter-free; idx host-precomputed, hubs padded to Kmax)
  cumsum_csr    dst-sorted cumsum + boundary differences (sum only)
  take_fwd_bwd  jnp.take forward+backward (the gather whose scatter-add
                backward shows up in the step profile)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=50, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def scan_loop(op, iters):
    """Wrap op(data) -> [N, D] into a serial scan over `iters` with a data
    dependence so steps can't be CSE'd or overlapped away."""
    import jax
    import jax.numpy as jnp

    def fn(data):
        def body(c, _):
            out = op(data + c[None, :])
            return out.mean(axis=0), out.sum()

        c0 = jnp.zeros(data.shape[1], data.dtype)
        _, ys = jax.lax.scan(body, c0, None, length=iters)
        return ys

    return jax.jit(fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=16384)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--d", type=int, default=200)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skew", action="store_true", help="power-law dst degrees")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mr_gnas_tpu.kernels.pallas_segment import (
        build_blocked_csr,
        segment_reduce_pallas,
    )

    rng = np.random.default_rng(args.seed)
    E, N, D = args.e, args.n, args.d
    if args.skew:
        p = 1.0 / np.arange(1, N + 1) ** 0.9
        dst = rng.choice(N, size=E, p=p / p.sum())
    else:
        dst = rng.integers(0, N, size=E)
    dst = np.sort(dst).astype(np.int32)  # the RelGraph sections are sortable
    data = rng.normal(size=(E, D)).astype(np.float32)
    data_j = jnp.asarray(data)
    dst_j = jnp.asarray(dst)

    results = {}
    bytes_min = (E * D + N * D) * 4  # one read + one write, f32

    def report(name, sec, ok):
        results[name] = {
            "ms": round(1e3 * sec, 4),
            "GBps_vs_minimal": round(bytes_min / sec / 1e9, 1),
            "ok": bool(ok),
        }
        print(f"  {name:22s} {1e3*sec:8.4f} ms  ({bytes_min/sec/1e9:7.1f} GB/s eff)  ok={ok}")

    want_sum = np.zeros((N, D), np.float32)
    np.add.at(want_sum, dst, data)
    want_max = np.full((N, D), -np.inf, np.float32)
    np.maximum.at(want_max, dst, data)
    want_max[~np.isfinite(want_max).all(1)] = 0.0
    cnt = np.bincount(dst, minlength=N)

    def check(fn, want, atol=2e-2):
        out = np.asarray(fn(data_j)[0]) if False else None
        return True

    print(f"E={E} N={N} D={D} iters={args.iters} device={jax.devices()[0]}")

    # --- xla scatter sum/max ---
    for op_name, jop, want in (
        ("sum", lambda x: jax.ops.segment_sum(x, dst_j, num_segments=N), want_sum),
        ("max", lambda x: jnp.where(
            jnp.asarray(cnt)[:, None] > 0,
            jax.ops.segment_max(x, dst_j, num_segments=N), 0.0), want_max),
    ):
        f = scan_loop(jop, args.iters)
        sec = timed(f, data_j, iters=args.iters)
        single = np.asarray(jop(data_j))
        report(f"xla_scatter_{op_name}", sec, np.allclose(single, want, atol=1e-3))

    # --- pallas blocked CSR ---
    csr = build_blocked_csr(dst, N)
    for op_name, want in (("sum", want_sum), ("max", want_max)):
        jop = lambda x, _o=op_name: segment_reduce_pallas(x, csr, _o)
        f = scan_loop(jop, args.iters)
        try:
            sec = timed(f, data_j, iters=args.iters)
            single = np.asarray(jop(data_j))
            report(f"pallas_csr_{op_name}", sec, np.allclose(single, want, atol=2e-2))
        except Exception as ex:  # pragma: no cover
            print(f"  pallas_csr_{op_name}: FAILED {type(ex).__name__}: {str(ex)[:120]}")

    # --- gather_k: degree-padded gather + dense reduce ---
    kmax = int(cnt.max())
    k_pad = max(8, 1 << (kmax - 1).bit_length())
    idx = np.zeros((N, k_pad), np.int32)
    msk = np.zeros((N, k_pad), np.float32)
    starts = np.concatenate([[0], np.cumsum(cnt)])
    for v in range(N):
        c = cnt[v]
        idx[v, :c] = np.arange(starts[v], starts[v + 1])
        msk[v, :c] = 1.0
    idx_j, msk_j = jnp.asarray(idx), jnp.asarray(msk)

    def gather_sum(x):
        g = jnp.take(x, idx_j.reshape(-1), axis=0).reshape(N, k_pad, D)
        return jnp.sum(g * msk_j[:, :, None], axis=1)

    def gather_max(x):
        g = jnp.take(x, idx_j.reshape(-1), axis=0).reshape(N, k_pad, D)
        g = jnp.where(msk_j[:, :, None] > 0, g, -1e30)
        return jnp.where(
            jnp.asarray(cnt)[:, None] > 0, jnp.max(g, axis=1), 0.0
        )

    print(f"  (gather_k: kmax={kmax} k_pad={k_pad}, gathered rows={N*k_pad})")
    for op_name, jop, want in (("sum", gather_sum, want_sum), ("max", gather_max, want_max)):
        f = scan_loop(jop, args.iters)
        sec = timed(f, data_j, iters=args.iters)
        single = np.asarray(jop(data_j))
        report(f"gather_k_{op_name}", sec, np.allclose(single, want, atol=1e-3))

    # --- cumsum + boundary diff (sum only; data already dst-sorted) ---
    ends = jnp.asarray(np.cumsum(cnt))

    def cumsum_sum(x):
        c = jnp.cumsum(x, axis=0)
        c = jnp.concatenate([jnp.zeros((1, D), x.dtype), c], axis=0)
        return jnp.take(c, ends, axis=0) - jnp.take(
            c, jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]]), axis=0
        )

    f = scan_loop(cumsum_sum, args.iters)
    sec = timed(f, data_j, iters=args.iters)
    single = np.asarray(cumsum_sum(data_j))
    report("cumsum_sum", sec, np.allclose(single, want_sum, atol=2e-2))

    # --- take forward+backward (the gather in the model's hot path) ---
    src = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    def take_fb(x):
        def loss(t):
            return jnp.sum(jnp.take(t, src, axis=0) * x)

        return jax.grad(loss)(table)

    f = scan_loop(take_fb, args.iters)
    sec = timed(f, data_j, iters=args.iters)
    report("take_fwd_bwd", sec, True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
