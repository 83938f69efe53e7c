"""Multi-device scaling benchmark: edge-partitioned supernet training.

Measures edges/sec of the LP supernet train step under the manual-SPMD
formulation (dist/spmd.py): each device owns a contiguous slice of the
relation-sorted edge sections plus one node block; the cells merge
aggregation partials with reduce-scatter / all-to-all-max, BN statistics
psum, and one all-gather per layer rebuilds the node table. Device count
1 runs the plain single-device program (the same code path the drivers
use without --mesh-shape).

On a real multi-chip slice this reports ICI scaling (the BASELINE.md
scaling-efficiency metric); on a single host it can run against the
virtual CPU mesh (``--cpu``), which validates the sharded program
end-to-end but measures shared-core overhead, not true scaling — all
"devices" compete for the same host cores, so the per-device efficiency
number is a lower bound on structural (non-comm) overhead only.

Prints one JSON line per device count.
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="use virtual CPU devices")
    ap.add_argument("--devices", type=int, default=0, help="max devices (0=all)")
    ap.add_argument("--graph-batch", type=int, default=2048)
    ap.add_argument("--feature-dim", type=int, default=64)
    ap.add_argument("--negative-sample", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument(
        "--pallas-agg", action="store_true",
        help="per-shard blocked-CSR Pallas aggregation (TPU only)",
    )
    ap.add_argument(
        "--megakernel", action="store_true",
        help="BN-mix megakernel in the supernet cells (TPU only)",
    )
    ap.add_argument(
        "--spmd-at-1", action="store_true",
        help="run the manual-SPMD (shard_map) path even on 1 device — "
        "measures the sharded program's overhead vs the plain path on a "
        "single chip (collectives are no-ops on a 1-device mesh)",
    )
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from mr_gnas_tpu.cells import CellSpec, init_alphas
    from mr_gnas_tpu.data import (
        generate_sampled_graph_and_labels,
        get_adj_and_degrees,
        synthetic_kg,
    )
    from mr_gnas_tpu.dist import make_mesh, replicate
    from mr_gnas_tpu.dist.spmd import build_local_batch, make_spmd_loss
    from mr_gnas_tpu.models import LPSupernet
    from mr_gnas_tpu.models.lp import lp_search_loss_grouped

    n_avail = len(jax.devices())
    max_dev = min(args.devices or n_avail, n_avail)

    kg = synthetic_kg(num_ent=4096, num_rels=64, n_train=4 * args.graph_batch, seed=0)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    # rows divisible by 8 regardless of device count
    n_nodes_pad = 4096
    batch = generate_sampled_graph_and_labels(
        kg.train, args.graph_batch, 0.5, kg.num_rels, adj, deg,
        args.negative_sample, "uniform",
        np.random.default_rng(0), n_nodes_pad=n_nodes_pad, grouped=True,
    )
    assert batch.graph.n_fwd % 8 == 0 and batch.graph.n_nodes % 8 == 0

    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent, num_rels=kg.num_rels, layers=2, spec=spec,
        feature_dim=args.feature_dim, init_fea_dim=32, num_base_r=32,
        dropout_cell=0.0, drop_aggr=0.0, megakernel=args.megakernel,
    )
    alphas = init_alphas(jax.random.key(0), spec, 2, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)
    tx = optax.sgd(1e-3, momentum=0.9)
    n_edges = int(np.asarray(batch.graph.edge_mask).sum())

    def local_loss_fn(p, bs, a, graph, t, l, dkey, training=True):
        (e, r), mut = model.apply(
            {"params": p, "batch_stats": bs}, graph, a, training,
            mutable=["batch_stats"], rngs={"dropout": dkey},
        )
        nh, nt = l
        return lp_search_loss_grouped(e, r, t, nh, nt), mut["batch_stats"]

    results = []
    n = 1
    while n <= max_dev:
        if n == 1 and not args.spmd_at_1:
            loss_fn = local_loss_fn
            graph = batch.graph
            if args.pallas_agg:
                import dataclasses

                from mr_gnas_tpu.graph.build import attach_csr

                graph = attach_csr(graph, static_pad=True)
            trip = jnp.asarray(batch.triplets)
            lab = (jnp.asarray(batch.neg_heads), jnp.asarray(batch.neg_tails))
            mesh = None
        else:
            mesh = make_mesh(
                (n,), ("data",), devices=np.asarray(jax.devices()[:n])
            )
            lb = build_local_batch(batch, mesh, pallas_csr=args.pallas_agg)
            loss_fn = make_spmd_loss(mesh, local_loss_fn)
            graph = lb.graph
            trip = lb.triplets
            lab = (lb.neg_heads, lb.neg_tails)
        params = variables["params"]
        bstats = variables["batch_stats"]
        a_rep = alphas
        if mesh is not None:
            params, bstats, a_rep = replicate((params, bstats, a_rep), mesh)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, bstats, opt_state, graph, trip, lab, key):
            def wloss(p):
                return loss_fn(p, bstats, a_rep, graph, trip, lab, key, True)

            (loss, nb), grads = jax.value_and_grad(wloss, has_aux=True)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), nb, opt_state, loss

        key = jax.random.key(2)
        p2, b2, o2 = params, bstats, opt_state
        for _ in range(2):
            key, k = jax.random.split(key)
            p2, b2, o2, loss = step(p2, b2, o2, graph, trip, lab, k)
        loss.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            p2, b2, o2, loss = step(p2, b2, o2, graph, trip, lab, k)
        loss.block_until_ready()
        dt = (time.perf_counter() - t0) / args.steps
        eps = n_edges / dt
        results.append((n, eps))
        base = results[0][1]
        print(
            json.dumps(
                {
                    "metric": "lp_supernet_scaling_spmd",
                    "devices": n,
                    "edges_per_sec": round(eps, 1),
                    "efficiency_vs_1dev": round(eps / base / n, 4) if n > 1 else 1.0,
                    "loss": round(float(loss), 6),
                    "platform": "cpu-virtual" if args.cpu else str(jax.devices()[0]),
                }
            ),
            flush=True,
        )
        n *= 2


if __name__ == "__main__":
    main()
