"""Per-pass microbenchmark of the bn_mix megakernel (VERDICT r4 item 6).

Times each of the four streaming passes (fwd-stats, fwd-apply,
bwd-reduce, bwd-apply) standalone at the headline 'first'-stage shapes
(p=2, R=145664 rows, D=200, bf16 slabs — the largest bn_mix site of the
131k search config, cells/fused.py:397-405), plus the full composite
fwd+bwd, and reports wall time and implied HBM bandwidth per pass.

Decision data for the "4 -> 2 pass" rewrite candidate (NOTES round-2/4):
if the passes run near HBM roofline, merging saves the merged passes'
DMA bytes; if they are VPU-bound (op recompute, sigmoid chains), a
2-pass variant saves little and the item retires with these numbers.

Usage: python scripts/bnmix_microbench.py [--cpu] [--iters N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rows", type=int, default=145664)
    ap.add_argument("--dim", type=int, default=200)
    ap.add_argument("--pairs", type=int, default=2)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mr_gnas_tpu.kernels.bn_mix import (
        bn_mix,
        bn_mix_apply,
        bn_mix_bwd_apply,
        bn_mix_bwd_reduce,
        bn_mix_stats,
    )

    p, r, d = args.pairs, args.rows, args.dim
    k = 4  # 'first' stage
    interp = args.cpu
    cdt = jnp.float32 if args.cpu else jnp.bfloat16
    esz = 4 if args.cpu else 2
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    slabs = tuple(
        jax.random.normal(ks[i], (p, r, d), cdt) for i in range(4)
    )
    u = jax.random.normal(ks[4], (p, r, 1), cdt)
    g = jax.random.normal(ks[5], (r, d), cdt)
    mask = jnp.ones((r, 1), jnp.float32)
    cnt = jnp.asarray(float(r), jnp.float32)
    gamma = jnp.ones((p * k, d), jnp.float32)
    beta = jnp.zeros((p * k, d), jnp.float32)
    w = jax.nn.softmax(jax.random.normal(ks[6], (p, k)), axis=-1)

    # precomputed stats for the apply/bwd passes
    print("precomputing stats...", flush=True)
    sums, sumsq = jax.jit(
        lambda s, uu, m: bn_mix_stats("first", s, uu, m, interp)
    )(slabs, u, mask)
    mean = sums / cnt
    var = jnp.maximum(sumsq / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    a = inv * gamma
    b = beta - mean * a

    def timed(name, fn, *xs, bytes_moved=0):
        print(f"compiling {name}...", flush=True)
        f = jax.jit(fn)
        out = f(*xs)
        print(f"  {name} compiled; timing", flush=True)
        jax.block_until_ready(out)
        # value fetch = reliable barrier through the tunnel
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*xs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jax.device_get(leaf.ravel()[0]))
        dt = (time.perf_counter() - t0) / args.iters
        gbps = bytes_moved / dt / 1e9 if bytes_moved else 0.0
        print(
            f"{name:12s} {dt * 1e3:8.3f} ms   {bytes_moved / 1e6:8.1f} MB"
            f"   {gbps:7.1f} GB/s", flush=True
        )
        return dt

    slab_b = 4 * p * r * d * esz + p * r * 1 * esz  # 4 slabs + u
    out_b = r * d * esz
    stat_b = 2 * p * k * d * 4

    print(f"shapes: p={p} R={r} D={d} k={k} dtype={cdt.__name__}", flush=True)
    t_stats = timed(
        "fwd-stats",
        lambda s, uu, m: bn_mix_stats("first", s, uu, m, interp),
        slabs, u, mask, bytes_moved=slab_b + stat_b,
    )
    t_apply = timed(
        "fwd-apply",
        lambda s, uu, aa, bb, ww: bn_mix_apply(
            "first", s, uu, aa, bb, ww, cdt, interp
        ),
        slabs, u, a, b, w, bytes_moved=slab_b + out_b,
    )
    t_red = timed(
        "bwd-reduce",
        lambda s, uu, gg, aa, bb, mm, ii, ww: bn_mix_bwd_reduce(
            "first", s, uu, gg, aa, bb, mm, ii, ww, interp
        ),
        slabs, u, g, a, b, mean, inv, w,
        bytes_moved=slab_b + out_b + 3 * stat_b,
    )
    t_bapp = timed(
        "bwd-apply",
        lambda s, uu, gg, aa, bb, mm, ii, gi, ww, s1, s2, mk: bn_mix_bwd_apply(
            "first", s, uu, gg, aa, bb, mm, ii, gi, ww, s1, s2, mk, interp
        ),
        slabs, u, g, a, b, mean, inv, gamma * inv, w,
        sums / cnt, sumsq / cnt, mask,
        bytes_moved=2 * slab_b + out_b,
    )

    def full(s, uu, gg):
        def f(s_, u_):
            out, _, _ = bn_mix(
                "first", interp, cdt, None, s_, u_, gamma, beta, w, mask, cnt
            )
            return jnp.sum(out * gg.astype(out.dtype))

        l, grads = jax.value_and_grad(f, argnums=(0, 1))(s, uu)
        return l, grads

    t_full = timed("full-vjp", full, slabs, u, g, bytes_moved=5 * slab_b)
    tot = t_stats + t_apply + t_red + t_bapp
    print(
        f"sum-of-passes {tot * 1e3:.3f} ms; full-vjp overhead "
        f"{(t_full - tot) * 1e3:+.3f} ms"
    )
    # the 2-pass floor keeps stats + bwd-reduce (global barriers) and
    # would at best absorb fwd-apply and bwd-apply into them
    print(
        f"2-pass-floor upper bound on saving: "
        f"{(t_apply + t_bapp) * 1e3:.3f} ms/site "
        f"({100 * (t_apply + t_bapp) / tot:.0f}% of bn_mix)"
    )


if __name__ == "__main__":
    main()
