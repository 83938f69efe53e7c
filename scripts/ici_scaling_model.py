"""Analytical ICI scaling model for the SPMD LP-supernet train step.

The environment has ONE real TPU chip, so multi-chip scaling efficiency
cannot be measured; this script derives the *predicted* efficiency from
load-independent facts that CAN be audited here:

  * the per-step collective inventory of the compiled 8-device SPMD
    program (scripts/spmd_collectives.py — per 2-layer fwd+bwd:
    4 all-gathers, 4 all-to-alls, 5 reduce-scatters over [N_pad, D]
    node tables / partials, plus small [K, D] BN-stat and parameter-grad
    all-reduces);
  * the measured single-chip step time at the headline config
    (bench.py: 131072-edge graph batch, d=200, bf16, chunked negatives);
  * public v5e ICI figures (2D torus, 45 GB/s per link per direction,
    2 links usable per ring axis => ~90 GB/s effective ring bandwidth).

Model (ring collectives over one ICI axis):
  T_coll(V, n) = V * (n-1) / (n * W_ici)     per all-gather /
                 reduce-scatter / all-to-all of full size V
  T_small(n)   = n_small * (lat + V_small / W_ici)   BN-stat/grad
                 all-reduces (latency-bound)
  T_step(n)    = T_compute_1 / n + sum T_coll + T_small

The edge rows, node blocks, and triplet rows ALL shard over the axis
(dist/spmd.py), so compute scales 1/n; the only full-size tensors on
the wire are the [N_pad, D] node-table collectives — which do NOT grow
with the edge batch, so efficiency *improves* with batch size.

Usage: python scripts/ici_scaling_model.py [--step-ms 117.0]
Prints the bytes/step arithmetic and a predicted efficiency table.
"""
from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=117.0,
                    help="measured single-chip step wall (BENCH_r03: "
                    "117 ms at the 131k chunked headline config)")
    ap.add_argument("--n-pad", type=int, default=14592,
                    help="padded node count (FB15k-237: 14541 -> 14592)")
    ap.add_argument("--dim", type=int, default=200)
    ap.add_argument("--dtype-bytes", type=int, default=4,
                    help="node tables cross the wire in f32 (cell "
                    "outputs); 4 bytes")
    ap.add_argument("--ici-gbps", type=float, default=90.0,
                    help="effective ring bandwidth GB/s (v5e: 45 GB/s "
                    "per link per direction x 2 links per torus axis)")
    ap.add_argument("--n-ag", type=int, default=4)
    ap.add_argument("--n-a2a", type=int, default=4)
    ap.add_argument("--n-rs", type=int, default=5)
    ap.add_argument("--n-small", type=int, default=8,
                    help="small all-reduces (BN stats [K, D], grad "
                    "psums; XLA batches them variadically)")
    ap.add_argument("--small-kb", type=float, default=200.0,
                    help="aggregate small-collective payload per step "
                    "(BN stats ~ K*D*4 x stages + batched grad psum)")
    ap.add_argument("--lat-us", type=float, default=1.0,
                    help="per-collective launch latency over ICI")
    args = ap.parse_args()

    v = args.n_pad * args.dim * args.dtype_bytes  # one [N_pad, D] table
    n_big = args.n_ag + args.n_a2a + args.n_rs
    w = args.ici_gbps * 1e9
    print(f"node-table collective size V = {args.n_pad} x {args.dim} x "
          f"{args.dtype_bytes} = {v / 1e6:.2f} MB")
    print(f"big collectives/step = {args.n_ag} all-gather + {args.n_a2a} "
          f"all-to-all + {args.n_rs} reduce-scatter = {n_big} "
          f"(total {n_big * v / 1e6:.1f} MB full-size)")
    print(f"ICI effective ring bandwidth = {args.ici_gbps:.0f} GB/s; "
          f"measured 1-chip step = {args.step_ms:.1f} ms\n")

    t1 = args.step_ms / 1e3
    print(f"{'chips':>6} {'T_comm ms':>10} {'T_small ms':>11} "
          f"{'T_step ms':>10} {'edges/s total':>14} {'efficiency':>11}")
    crossover = None
    for n in (2, 4, 8, 16, 32, 64, 128, 256):
        t_comm = n_big * v * (n - 1) / (n * w)
        t_small = args.n_small * (args.lat_us * 1e-6 + args.small_kb * 1e3
                                  / args.n_small / w)
        t_step = t1 / n + t_comm + t_small
        eff = (t1 / n) / t_step
        eps = 131072 / t_step
        print(f"{n:>6} {t_comm * 1e3:>10.2f} {t_small * 1e3:>11.3f} "
              f"{t_step * 1e3:>10.2f} {eps:>14,.0f} {eff:>10.1%}")
        if crossover is None and t_comm > t1 / n:
            crossover = n
    print(f"\ncomm-dominance crossover (T_comm > T_compute/n): "
          f"n >= {crossover} chips" if crossover else
          "\nno crossover within 256 chips")
    print("north-star check: >= 80% efficiency holds through 16 chips "
          "at the 131k headline config under this model (90.8% at 8, "
          "82.1% at 16; 69% at 32 as the fixed [N_pad, D] collectives "
          "stop amortizing).")


if __name__ == "__main__":
    main()
