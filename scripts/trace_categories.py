#!/usr/bin/env python
"""Aggregate a perfetto trace's per-op device time by HLO category.

Classifies each traced HLO computation (fusion.N, custom-call, copy...)
by inspecting the optimized HLO of the compiled step: a fusion counts as
'scatter' if its fused computation contains a scatter, 'gather' for
gathers, 'matmul' for dot/convolution, 'copy/transpose' for
copy-dominant ops, else 'elementwise'. This is the measured roofline
table (NOTES.md) regenerated from first principles.

Usage: python scripts/trace_categories.py [--graph-batch 4096] [--bf16]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify(name: str, hlo_computations: dict) -> str:
    base = name.split("(")[0].strip()
    if base.startswith("copy") or ".copy" in base or base.startswith("transpose"):
        return "copy/transpose"
    # NB: metadata op_name strings contain "transpose(jvp(...))" (autodiff
    # transpose, not a layout transpose) — callers must strip metadata
    # from bodies before classification.
    body = hlo_computations.get(base, "")
    if not body:
        # non-fusion standalone ops
        for tag, cat in [
            ("scatter", "scatter"),
            ("gather", "gather"),
            ("dot(", "matmul"),
            ("convolution", "matmul"),
            ("copy", "copy/transpose"),
            ("dynamic-update-slice", "dus"),
            ("reduce", "reduce"),
        ]:
            if tag in base:
                return cat
        return "other"
    if "scatter(" in body or " scatter" in body:
        return "scatter"
    if "convolution(" in body or " dot(" in body or "dot(" in body:
        return "matmul"
    if "gather(" in body:
        return "gather"
    if "transpose(" in body and body.count("transpose(") > body.count("add("):
        return "copy/transpose"
    return "elementwise"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph-batch", type=int, default=4096)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/mrgnas_cat")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top-per-cat", type=int, default=4)
    ap.add_argument("--csr-grads", action="store_true")
    ap.add_argument("--pallas-agg", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--grouped-neg", action="store_true")
    ap.add_argument("--megakernel", action="store_true")
    ap.add_argument("--neg-chunk", type=int, default=0)
    args = ap.parse_args()

    import jax

    from bench import make_step

    train_step, (params, bstats, opt_state), (graph, trip, lab) = make_step(
        bf16=args.bf16, graph_batch=args.graph_batch,
        csr_grads=args.csr_grads, pallas_agg=args.pallas_agg, remat=args.remat,
        grouped_neg=args.grouped_neg, megakernel=args.megakernel,
        neg_chunk=args.neg_chunk,
    )
    key = jax.random.key(2)
    lowered = train_step.lower(params, bstats, opt_state, graph, trip, lab, key)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # split optimized HLO into computations: "%name (params) -> ... {body}"
    comps: dict = {}
    comps_raw: dict = {}  # with metadata, for source attribution
    cur = None
    buf: list = []
    buf_raw: list = []
    meta_re = re.compile(r", metadata=\{[^}]*\}")
    for line in hlo.splitlines():
        m = re.match(r"^\s*%?([\w\.\-]+)\s*\(.*\)\s*->.*\{", line)
        if m:
            if cur:
                comps[cur] = "\n".join(buf)
                comps_raw[cur] = "\n".join(buf_raw)
            cur = m.group(1).rstrip(".")
            buf = []
            buf_raw = []
        elif cur is not None:
            # strip metadata: its op_name strings contain "transpose(jvp"
            # and similar autodiff names that would poison classification
            buf.append(meta_re.sub("", line))
            buf_raw.append(line)
    if cur:
        comps[cur] = "\n".join(buf)
        comps_raw[cur] = "\n".join(buf_raw)
    # fusion instructions reference their computation via calls=%fused_x;
    # map instruction name -> fused computation body (line-wise: shapes can
    # be arbitrary tuples, so just grab name, 'fusion(', and calls=)
    inst2comp: dict = {}
    inst2raw: dict = {}
    for line in hlo.splitlines():
        if " fusion(" not in line or "calls=" not in line:
            continue
        mn = re.match(r"\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=", line)
        mc = re.search(r"calls=%?([\w\.\-]+)", line)
        if mn and mc:
            inst2comp[mn.group(1)] = comps.get(mc.group(1), "")
            inst2raw[mn.group(1)] = comps_raw.get(mc.group(1), "")

    src_re = re.compile(r'op_name="([^"]+)"')

    def sources(base, k=2):
        """Top-k source op_names in a fusion body, by frequency — the
        'which model line produced this fusion' attribution."""
        body = inst2raw.get(base) or comps_raw.get(base, "")
        counts = defaultdict(int)
        for m in src_re.finditer(body):
            counts[m.group(1)] += 1
        top = sorted(counts.items(), key=lambda kv: -kv[1])[:k]
        return " | ".join(t[0][-90:] for t in top)

    def lookup(base, depth=0):
        body = inst2comp.get(base) or comps.get(base, "")
        # inline nested fusion computations (scatter often sits one level
        # down inside a kCustom wrapper)
        if depth < 3:
            for mc in re.finditer(r"calls=%?([\w\.\-]+)", body):
                body = body + "\n" + lookup(mc.group(1), depth + 1)
        return body

    # ---- trace ----------------------------------------------------------
    def run(n):
        nonlocal params, bstats, opt_state, key
        loss = None
        for _ in range(n):
            key, k = jax.random.split(key)
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, graph, trip, lab, k
            )
        loss.block_until_ready()

    run(3)
    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir, create_perfetto_trace=True)
    run(args.steps)
    jax.profiler.stop_trace()
    paths = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    per_op = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            if name.startswith("jit_train_step") or name.isdigit():
                continue  # step-envelope events double-count their children
            per_op[name] += float(e.get("dur", 0.0))

    cats = defaultdict(float)
    cat_ops = defaultdict(list)
    total = 0.0
    for name, dur in per_op.items():
        base = name.split("(")[0].strip()
        c = classify(base, {base: lookup(base)})
        cats[c] += dur
        cat_ops[c].append((dur, name))
        total += dur

    n = args.steps
    print(f"\ndevice-op time by HLO category ({n} steps, total {total/1e3/n:.2f} ms/step):")
    for c, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {dur/1e3/n:8.3f} ms/step  {100*dur/max(total,1e-9):5.1f}%  {c}")
        for d, nm in sorted(cat_ops[c], reverse=True)[: args.top_per_cat]:
            base = nm.split("(")[0].strip()
            print(f"      {d/1e3/n:8.3f}   {nm[:60]}  <- {sources(base)}")


if __name__ == "__main__":
    main()
