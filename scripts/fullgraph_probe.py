"""Probe trace/compile/run cost of the full-graph LP retrain step.

The reference recomputes the FULL training graph per minibatch
(/root/reference/models/model_lp.py:123-137 — 272k triples = 544k edge
rows at FB15k-237 scale). Earlier rounds never got this program through
the axon tunnel's remote-compile budget (NOTES.md); this probe separates
the stages so the attack lands on the right one:

    python scripts/fullgraph_probe.py --max-edges 0     # full graph
    python scripts/fullgraph_probe.py --max-edges 131072

Prints per-stage wall-clock: graph build, model init, jit trace
(.lower()), XLA compile (.compile()), first run, amortized step.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-edges", type=int, default=0, help="0 = full graph")
    ap.add_argument("--score-func", default="sf_ConvE")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--cache-dir", default="",
                    help="use this compile-cache dir (fresh dir = honest "
                         "cold-compile measurement)")
    ap.add_argument("--pallas-agg", action="store_true",
                    help="Pallas blocked-CSR aggregators instead of XLA "
                         "scatters (cold-compile suspect at 544k rows)")
    args = ap.parse_args()

    import jax

    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    elif not args.no_cache:
        from bench import _enable_compile_cache

        _enable_compile_cache()

    from bench import make_step_lptrain

    t0 = time.perf_counter()
    train_step, (params, bstats, opt_state), inputs = make_step_lptrain(
        score_func=args.score_func, max_train_edges=args.max_edges,
        pallas_agg=args.pallas_agg,
    )
    graph = inputs[0]
    t1 = time.perf_counter()
    print(f"build+init: {t1 - t0:.1f}s  (rows/layer = "
          f"{int(graph.src.shape[0])}, nodes = {graph.n_nodes})", flush=True)

    key = jax.random.key(2)
    lowered = train_step.lower(params, bstats, opt_state, *inputs, key)
    t2 = time.perf_counter()
    print(f"trace (.lower): {t2 - t1:.1f}s", flush=True)

    compiled = lowered.compile()
    t3 = time.perf_counter()
    print(f"compile: {t3 - t2:.1f}s", flush=True)
    try:
        mem = compiled.memory_analysis()
        print(f"memory: argument {mem.argument_size_in_bytes/2**30:.2f}GiB "
              f"output {mem.output_size_in_bytes/2**30:.2f}GiB "
              f"temp {mem.temp_size_in_bytes/2**30:.2f}GiB", flush=True)
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"memory analysis unavailable: {e}", flush=True)

    params, bstats, opt_state, loss = compiled(
        params, bstats, opt_state, *inputs, key
    )
    loss.block_until_ready()
    t4 = time.perf_counter()
    # through the axon tunnel, block_until_ready can return before the
    # remote execution finishes (observed round 4); the value fetch is
    # the reliable barrier — time both
    lv = float(loss)
    t4b = time.perf_counter()
    print(f"first run: dispatch+block {t4 - t3:.1f}s, value fetch "
          f"{t4b - t4:.1f}s, loss={lv:.5f}", flush=True)

    t5 = time.perf_counter()
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        params, bstats, opt_state, loss = compiled(
            params, bstats, opt_state, *inputs, k
        )
    float(loss)  # value fetch = the reliable tunnel barrier (see above)
    dt = time.perf_counter() - t5
    n_edges = int(__import__("numpy").asarray(graph.edge_mask).sum())
    print(f"step: {1e3 * dt / args.steps:.2f} ms  "
          f"edges/s = {n_edges * args.steps / dt:,.0f}  loss={float(loss):.5f}",
          flush=True)


if __name__ == "__main__":
    main()
