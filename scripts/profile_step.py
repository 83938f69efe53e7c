#!/usr/bin/env python
"""Profile the headline bench step on the attached device (TPU).

Produces the measured (not modeled) roofline inputs VERDICT.md asked for:
  * XLA's own cost analysis of the compiled step (FLOPs, bytes accessed,
    per-memory-space traffic) via ``Compiled.cost_analysis()``;
  * a wall-clock step time -> achieved FLOP/s and bytes/s;
  * optionally a perfetto trace (trace.json.gz) with a per-op time
    aggregation printed from it.

Usage:
    python scripts/profile_step.py [--steps 20] [--bf16] [--trace]
        [--graph-batch 4096]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--trace", action="store_true", help="dump + parse a perfetto trace")
    ap.add_argument("--trace-dir", default="/tmp/mrgnas_prof")
    ap.add_argument("--graph-batch", type=int, default=4096)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    from bench import make_step

    train_step, (params, bstats, opt_state), (graph, trip, lab) = make_step(
        bf16=args.bf16, graph_batch=args.graph_batch
    )
    key = jax.random.key(2)

    # ---- compiled cost analysis ----------------------------------------
    lowered = train_step.lower(params, bstats, opt_state, graph, trip, lab, key)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    ca = dict(ca or {})
    flops = ca.get("flops", 0.0)
    bytes_total = ca.get("bytes accessed", 0.0)
    by_space = {
        k: v for k, v in ca.items() if k.startswith("bytes accessed") and k != "bytes accessed"
    }
    mem = compiled.memory_analysis()

    # ---- timed run ------------------------------------------------------
    def run(n):
        nonlocal params, bstats, opt_state, key
        loss = None
        for _ in range(n):
            key, k = jax.random.split(key)
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, graph, trip, lab, k
            )
        loss.block_until_ready()
        return loss

    run(args.warmup)
    t0 = time.perf_counter()
    run(args.steps)
    dt = (time.perf_counter() - t0) / args.steps

    n_edges = int(jax.device_get(graph.edge_mask).sum())
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "compile_s": round(compile_s, 1),
        "step_ms": round(1e3 * dt, 3),
        "edges_per_sec": round(n_edges / dt, 1),
        "xla_flops_per_step": flops,
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "xla_bytes_accessed": bytes_total,
        "achieved_GBps": round(bytes_total / dt / 1e9, 1),
        "bytes_by_space": by_space,
        "hbm_peak_bytes": getattr(mem, "temp_size_in_bytes", None),
        "argument_size": getattr(mem, "argument_size_in_bytes", None),
        "output_size": getattr(mem, "output_size_in_bytes", None),
    }, indent=2))

    # ---- perfetto trace & per-op aggregation ----------------------------
    if args.trace:
        os.makedirs(args.trace_dir, exist_ok=True)
        jax.profiler.start_trace(args.trace_dir, create_perfetto_trace=True)
        run(3)
        jax.profiler.stop_trace()
        paths = sorted(
            glob.glob(os.path.join(args.trace_dir, "**", "*.json.gz"), recursive=True),
            key=os.path.getmtime,
        )
        if not paths:
            print("no perfetto trace found under", args.trace_dir)
            return
        with gzip.open(paths[-1], "rt") as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        # keep device-track complete events; aggregate duration by name
        pid_names = {
            e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
        }
        device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
        agg = defaultdict(float)
        total = 0.0
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in device_pids:
                name = e.get("name", "?")
                dur = float(e.get("dur", 0.0))
                agg[name] += dur
                total += dur
        top = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
        print(f"\nper-op device time over 3 traced steps (total {total/1e3:.2f} ms):")
        for name, dur in top:
            print(f"  {dur/1e3:9.3f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
