#!/usr/bin/env python
"""Per-layer activation parity harness (BASELINE.md: per-layer allclose).

Two subcommands:

``dump``    — run our LPNetwork on a dataset with a given genotype and
              (optionally) a weights npz, recording per-layer entity
              embeddings and the final scores for a fixed query batch to
              an .npz trace.
``dump-ref`` — produce the reference-side trace with the torch oracle
              (tests/oracle_torch.py, a line-faithful no-DGL replica of
              the reference networks), transplanting the weights from the
              same init/checkpoint used by ``dump`` so the two traces are
              directly comparable.
``compare`` — allclose-compare two trace files (ours vs the
              oracle-produced reference trace).

Trace schema (npz): ``layer_{i}`` [num_ent, D] per cell layer,
``rel_{i}`` [num_rel, D], ``scores`` [B, num_ent], ``subj``/``rel_q`` [B].

Usage:
    python scripts/parity_trace.py dump --dataset synthetic \
        --genotype "<...>" --out trace_ours.npz
    python scripts/parity_trace.py compare trace_ours.npz trace_ref.npz \
        --rtol 1e-4 --atol 1e-5
"""
from __future__ import annotations

import argparse
import sys

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def dump(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mr_gnas_tpu.data import load_dataset
    from mr_gnas_tpu.graph import build_rel_graph
    from mr_gnas_tpu.models import LPNetwork
    from mr_gnas_tpu.train.checkpoint import load_checkpoint
    from mr_gnas_tpu.train.lp_train import parse_genotypes

    kg = load_dataset(args.dataset, args.data_root)
    graph = build_rel_graph(kg.train, kg.num_ent, kg.num_rels)
    genos = parse_genotypes(args.genotype)
    model = LPNetwork(
        genotypes=tuple(genos),
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        feature_dim=args.feature_dim,
        init_fea_dim=args.init_fea_dim,
        num_base_r=args.num_base_r,
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    z = jnp.zeros((4,), jnp.int32)
    variables = model.init(jax.random.key(args.seed), graph, z, z, False)
    if args.checkpoint:
        state, _ = load_checkpoint(
            args.checkpoint, jax.device_get(variables)
        )
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}

    out = {}
    _, _, trace = model.apply(
        variables, graph, False, method=LPNetwork.encode_trace
    )
    for i, (e_i, r_i) in enumerate(trace):
        out[f"layer_{i}"] = np.asarray(e_i)[: kg.num_ent]
        out[f"rel_{i}"] = np.asarray(r_i)

    rng = np.random.default_rng(args.seed)
    subj = rng.integers(0, kg.num_ent, size=args.batch).astype(np.int32)
    rel_q = rng.integers(0, 2 * kg.num_rels, size=args.batch).astype(np.int32)
    scores = model.apply(variables, graph, jnp.asarray(subj), jnp.asarray(rel_q), False)
    out["scores"] = np.asarray(scores)
    out["subj"] = subj
    out["rel_q"] = rel_q
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)}")
    return 0


def dump_ref(args) -> int:
    """Reference-side trace via the torch oracle with transplanted weights."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    import oracle_torch as oracle

    from mr_gnas_tpu.data import load_dataset
    from mr_gnas_tpu.graph import build_rel_graph
    from mr_gnas_tpu.models import LPNetwork
    from mr_gnas_tpu.train.checkpoint import load_checkpoint
    from mr_gnas_tpu.train.lp_train import parse_genotypes

    kg = load_dataset(args.dataset, args.data_root)
    graph = build_rel_graph(kg.train, kg.num_ent, kg.num_rels)
    genos = parse_genotypes(args.genotype)
    model = LPNetwork(
        genotypes=tuple(genos),
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        feature_dim=args.feature_dim,
        init_fea_dim=args.init_fea_dim,
        num_base_r=args.num_base_r,
        dropout_cell=0.0,
        drop_aggr=0.0,
    )
    z = jnp.zeros((4,), jnp.int32)
    variables = model.init(jax.random.key(args.seed), graph, z, z, False)
    if args.checkpoint:
        state, _ = load_checkpoint(args.checkpoint, jax.device_get(variables))
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}

    tg = oracle.LPGraph(kg.train, kg.num_ent, kg.num_rels)
    onet = oracle.LPNetworkOracle(
        genos, kg.num_ent, kg.num_rels, args.feature_dim, args.init_fea_dim, args.num_base_r
    )
    oracle.load_lp_network_from_flax(onet, jax.device_get(variables), genos)
    onet.eval()
    out = {}
    with torch.no_grad():
        _, _, trace = onet.encode(tg)
        for i, (e_i, r_i) in enumerate(trace):
            out[f"layer_{i}"] = e_i.numpy()
            out[f"rel_{i}"] = r_i.numpy()
        rng = np.random.default_rng(args.seed)
        subj = rng.integers(0, kg.num_ent, size=args.batch).astype(np.int64)
        rel_q = rng.integers(0, 2 * kg.num_rels, size=args.batch).astype(np.int64)
        out["scores"] = onet(tg, torch.tensor(subj), torch.tensor(rel_q)).numpy()
    out["subj"] = subj.astype(np.int32)
    out["rel_q"] = rel_q.astype(np.int32)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)}")
    return 0


def compare(args) -> int:
    a = np.load(args.trace_a)
    b = np.load(args.trace_b)
    keys = sorted(set(a.files) & set(b.files))
    if not keys:
        print("no common arrays")
        return 1
    failed = 0
    for k in keys:
        try:
            np.testing.assert_allclose(a[k], b[k], rtol=args.rtol, atol=args.atol)
            print(f"  {k}: OK (max abs diff {np.abs(a[k]-b[k]).max():.3e})")
        except AssertionError:
            diff = np.abs(a[k].astype(np.float64) - b[k].astype(np.float64))
            print(f"  {k}: FAIL (max abs diff {diff.max():.3e}, mean {diff.mean():.3e})")
            failed += 1
    print(f"{len(keys) - failed}/{len(keys)} arrays allclose")
    return 1 if failed else 0


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cmd in ("dump", "dump-ref"):
        d = sub.add_parser(cmd)
        d.add_argument("--dataset", default="synthetic")
        d.add_argument("--data-root", default="data")
        d.add_argument("--genotype", required=True)
        d.add_argument("--checkpoint", default="")
        d.add_argument("--feature-dim", type=int, default=128)
        d.add_argument("--init-fea-dim", type=int, default=128)
        d.add_argument("--num-base-r", type=int, default=23)
        d.add_argument("--batch", type=int, default=32)
        d.add_argument("--seed", type=int, default=0)
        d.add_argument("--cpu", action="store_true", help="force CPU backend")
        d.add_argument("--out", required=True)
    c = sub.add_parser("compare")
    c.add_argument("trace_a")
    c.add_argument("trace_b")
    c.add_argument("--rtol", type=float, default=1e-4)
    c.add_argument("--atol", type=float, default=1e-5)
    args = ap.parse_args()
    if args.cmd == "dump":
        return dump(args)
    if args.cmd == "dump-ref":
        return dump_ref(args)
    return compare(args)


if __name__ == "__main__":
    sys.exit(main())
