"""Multi-device scaling benchmark: edge-partitioned supernet training.

Measures edges/sec of the LP supernet train step with the graph's edge
rows sharded over 1, 2, 4, ... devices of a mesh (the BASELINE.md
scaling-efficiency metric). On a real multi-chip slice this reports ICI
scaling; on a single host it can run against the virtual CPU mesh
(``--cpu``) which validates the sharded program end-to-end but measures
shared-core overhead, not true scaling (documented caveat).

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
    ap.add_argument("--steps", type=int, default=10)
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
    from mr_gnas_tpu.dist import make_mesh, replicate, shard_graph
    from mr_gnas_tpu.models import LPSupernet, lp_search_loss

    n_avail = len(jax.devices())
    max_dev = min(args.devices or n_avail, n_avail)

    kg = synthetic_kg(num_ent=4096, num_rels=64, n_train=4 * args.graph_batch, seed=0)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    # rows divisible by 8 regardless of device count
    n_nodes_pad = 4096
    batch = generate_sampled_graph_and_labels(
        kg.train, args.graph_batch, 0.5, kg.num_rels, adj, deg, 4, "uniform",
        np.random.default_rng(0), n_nodes_pad=n_nodes_pad,
    )
    assert batch.graph.n_rows % 8 == 0

    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent, num_rels=kg.num_rels, layers=2, spec=spec,
        feature_dim=args.feature_dim, init_fea_dim=32, num_base_r=32,
        dropout_cell=0.0, drop_aggr=0.0,
    )
    alphas = init_alphas(jax.random.key(0), spec, 2, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)
    tx = optax.sgd(1e-3, momentum=0.9)
    trip = jnp.asarray(batch.triplets)
    lab = jnp.asarray(batch.labels)
    n_edges = int(np.asarray(batch.graph.edge_mask).sum())

    results = []
    n = 1
    while n <= max_dev:
        mesh = make_mesh((n, 1), devices=np.asarray(jax.devices()[:n]))
        graph = shard_graph(batch.graph, mesh)
        params = replicate(variables["params"], mesh)
        bstats = replicate(variables["batch_stats"], mesh)
        a_rep = replicate(alphas, mesh)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, bstats, opt_state, graph, trip, lab, key):
            def loss_fn(p):
                (e, r), mut = model.apply(
                    {"params": p, "batch_stats": bstats}, graph, a_rep, True,
                    mutable=["batch_stats"], rngs={"dropout": key},
                )
                return lp_search_loss(e, r, trip, lab), mut["batch_stats"]

            (loss, nb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
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
                    "metric": "lp_supernet_scaling",
                    "devices": n,
                    "edges_per_sec": round(eps, 1),
                    "efficiency_vs_1dev": round(eps / base / n, 4) if n > 1 else 1.0,
                    "platform": "cpu-virtual" if args.cpu else str(jax.devices()[0]),
                }
            )
        )
        n *= 2


if __name__ == "__main__":
    main()
