"""Headline benchmark: LP supernet fwd+bwd throughput (edges/sec/chip).

The north-star metric (BASELINE.md): edge rows processed per second
through the full mixed-op supernet training step (forward + backward +
SGD update) at FB15k-237 search scale (d=200, 475 relation bases,
2 layers, 237 relations), on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against ``bench_baseline.json`` (the first
recorded TPU measurement of this framework — the reference publishes no
numbers, BASELINE.md, so the baseline is self-measured and later rounds
must beat it).
"""
from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def make_step(
    num_ent: int = 14541,
    num_rels: int = 237,
    feature_dim: int = 200,
    init_fea_dim: int = 100,
    num_base_r: int = 475,
    layers: int = 2,
    graph_batch: int = 4096,
    negative_rate: int = 10,
    bf16: bool = False,
    pallas_agg: bool = False,
    megakernel: bool = False,
    remat: bool = False,
    csr_grads: bool = False,
    grouped_neg: bool = False,
    neg_chunk: int = 0,
    spmd: bool = False,
):
    """Build the benchmark train step. Returns (train_step, state, inputs)
    where state = (params, bstats, opt_state) and
    inputs = (graph, trip, lab). Shared by bench.py and
    scripts/profile_step.py."""
    import jax
    import jax.numpy as jnp
    import optax

    from mr_gnas_tpu.cells import CellSpec, init_alphas
    from mr_gnas_tpu.data import (
        generate_sampled_graph_and_labels,
        get_adj_and_degrees,
        synthetic_kg,
    )
    from mr_gnas_tpu.graph.build import round_up
    from mr_gnas_tpu.models import LPSupernet, lp_search_loss

    rng = np.random.default_rng(0)
    kg = synthetic_kg(
        num_ent=num_ent, num_rels=num_rels, n_train=4 * graph_batch, seed=0
    )
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    n_nodes_pad = round_up(min(2 * graph_batch, kg.num_ent), 128)
    batch = generate_sampled_graph_and_labels(
        kg.train, graph_batch, 0.5, kg.num_rels, adj, deg, negative_rate,
        "uniform", rng, n_nodes_pad=n_nodes_pad, grouped=grouped_neg,
        neg_chunk=neg_chunk,
    )
    if pallas_agg and not spmd:
        import dataclasses

        from mr_gnas_tpu.graph.build import attach_csr

        # static_pad: same shapes/program across sampled graphs — the
        # lp-search driver path (auto-on for TPU backends)
        batch = dataclasses.replace(
            batch, graph=attach_csr(batch.graph, static_pad=True)
        )
    so_csr = neg_csr = None
    if csr_grads:
        # route the big embedding-gradient scatters (triplet (s,o) rows +
        # per-layer src re-gathers) through the one-hot MXU backward
        import dataclasses

        from mr_gnas_tpu.graph.build import attach_gather_csr, index_csr

        batch = dataclasses.replace(batch, graph=attach_gather_csr(batch.graph))
        if grouped_neg:
            so_idx = np.concatenate([batch.triplets[:, 0], batch.triplets[:, 2]])
            so_csr = index_csr(so_idx, batch.graph.n_nodes)
            neg_idx = np.concatenate(
                [batch.neg_tails.ravel(), batch.neg_heads.ravel()]
            )
            neg_csr = index_csr(neg_idx, batch.graph.n_nodes)
        else:
            so_idx = np.concatenate([batch.triplets[:, 0], batch.triplets[:, 2]])
            so_csr = index_csr(so_idx, batch.graph.n_nodes)

    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        layers=layers,
        spec=spec,
        feature_dim=feature_dim,
        init_fea_dim=init_fea_dim,
        num_base_r=num_base_r,
        dropout_cell=0.3,
        drop_aggr=0.1,
        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        megakernel=megakernel,
        remat=remat,
    )
    alphas = init_alphas(jax.random.key(0), spec, layers, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(1e-3, momentum=0.9)
    graph = batch.graph
    trip = jnp.asarray(batch.triplets)
    if grouped_neg:
        lab = (jnp.asarray(batch.neg_heads), jnp.asarray(batch.neg_tails))
    else:
        lab = jnp.asarray(batch.labels)

    # bf16 triplet path: the (s,o) gather, DistMult products, and the
    # grad scatter-add into the entity table run at half bytes (together
    # ~22% of the profiled step); reductions accumulate f32
    ldt = jnp.bfloat16 if bf16 else None

    def local_loss_fn(p, bs, a, g, t, l, dkey, training=True):
        (ent, rel), mut = model.apply(
            {"params": p, "batch_stats": bs}, g, a, training,
            mutable=["batch_stats"], rngs={"dropout": dkey},
        )
        if grouped_neg:
            nh, nt = l
            if neg_chunk > 0:
                from mr_gnas_tpu.models.lp import lp_search_loss_chunked

                return (
                    lp_search_loss_chunked(ent, rel, t, nh, nt, dtype=ldt),
                    mut["batch_stats"],
                )
            from mr_gnas_tpu.models import lp_search_loss_grouped

            return (
                lp_search_loss_grouped(
                    ent, rel, t, nh, nt, dtype=ldt,
                    so_csr=so_csr, neg_csr=neg_csr,
                ),
                mut["batch_stats"],
            )
        return lp_search_loss(ent, rel, t, l, so_csr, dtype=ldt), mut["batch_stats"]

    if spmd:
        # the lp-search driver's --mesh-shape composition at one device
        # (train/lp_search.py:107-110,231-239): manual-SPMD local batch +
        # shard_map'd loss on a 1-device 'data' mesh — collectives are
        # no-ops, but the sharded-local program measured FASTER than the
        # plain one on a single chip at the 32k config (906k vs 854k,
        # NOTES.md "single-chip SPMD overhead"); --spmd probes it at the
        # headline config
        from mr_gnas_tpu.dist import make_mesh, replicate
        from mr_gnas_tpu.dist.spmd import build_local_batch, make_spmd_loss

        mesh = make_mesh((1,), ("data",))
        lb = build_local_batch(batch, mesh, pallas_csr=pallas_agg)
        graph = lb.graph
        trip = lb.triplets
        lab = (lb.neg_heads, lb.neg_tails) if grouped_neg else lb.labels
        params, bstats, alphas = replicate((params, bstats, alphas), mesh)
        loss_fn = make_spmd_loss(mesh, local_loss_fn)
    else:
        loss_fn = local_loss_fn
    opt_state = tx.init(params)

    # donate params/bstats/opt_state: the optimizer writes fresh buffers
    # anyway, and donation lets XLA update in place instead of copying
    # (the profiled step spends ~16% in copies, NOTES.md roofline)
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, bstats, opt_state, graph, trip, lab, key):
        def wloss(p):
            return loss_fn(p, bstats, alphas, graph, trip, lab, key)

        (loss, new_bs), grads = jax.value_and_grad(wloss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    return train_step, (params, bstats, opt_state), (graph, trip, lab)


def run_bench(steps: int = 20, warmup: int = 3, rng_impl: str = "threefry2x32", **kw) -> dict:
    import jax

    train_step, (params, bstats, opt_state), (graph, trip, lab) = make_step(**kw)
    batch_graph = graph
    # rng_impl="rbg" routes the per-step dropout bits through the TPU
    # hardware RNG instead of software threefry (the profiled step spends
    # multiple ms/step generating threefry bits for the [rows,200]
    # dropout masks — NOTES.md roofline). Init keys stay threefry so
    # parameter initialization is unchanged.
    key = jax.random.key(2, impl=rng_impl)
    # edge rows actually processed per step (real fwd+inv rows)
    n_edges = int(np.asarray(batch_graph.edge_mask).sum())

    for i in range(warmup):
        key, k = jax.random.split(key)
        params, bstats, opt_state, loss = train_step(
            params, bstats, opt_state, batch_graph, trip, lab, k
        )
    float(loss)  # value fetch: a true barrier through the axon tunnel
    # (block_until_ready can return before the remote execution finishes)
    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        params, bstats, opt_state, loss = train_step(
            params, bstats, opt_state, batch_graph, trip, lab, k
        )
    float(loss)  # value fetch: a true barrier through the axon tunnel
    # (block_until_ready can return before the remote execution finishes)
    dt = time.perf_counter() - t0
    edges_per_sec = n_edges * steps / dt
    return {
        "edges_per_sec": edges_per_sec,
        "step_ms": 1e3 * dt / steps,
        "n_edges_per_step": n_edges,
        "loss": float(loss),
        "device": str(jax.devices()[0]),
    }


def make_step_nc(
    num_nodes: int = 8192,
    num_rels: int = 90,
    num_classes: int = 4,
    feature_dim: int = 64,
    init_fea_dim: int = 32,
    num_base_r: int = 45,
    layers: int = 2,
    seed_batch: int = 126,
    n_target: int = 512,
    avg_degree: int = 8,
):
    """NC supernet train step over 2-hop full-neighbor blocks at
    AIFB-like scale (~8.3k nodes, 90 typed edge directions, 4 classes,
    reference workload search/mr_nc_search.py:152-199). Returns
    (train_step, state, inputs) with inputs = (blocks, seed_pos, labels,
    mask)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mr_gnas_tpu.cells import CellSpec, init_alphas
    from mr_gnas_tpu.data import CSRGraph, build_blocks
    from mr_gnas_tpu.data.rdf import synthetic_nc
    from mr_gnas_tpu.models import NCSupernet, nc_loss

    ds = synthetic_nc(
        num_nodes=num_nodes, num_rels=num_rels, num_classes=num_classes,
        n_target=n_target, avg_degree=avg_degree, seed=0,
    )
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    seeds = ds.target_ids[:seed_batch]
    blocks, seed_pos = build_blocks(csr, seeds, layers)
    labels = jnp.asarray(ds.labels[:seed_batch])
    mask = jnp.ones((seed_batch,), jnp.float32)
    seed_pos = jnp.asarray(seed_pos)

    spec = CellSpec(task="nc")
    model = NCSupernet(
        num_nodes=ds.num_nodes, num_classes=ds.num_classes,
        num_rels=ds.num_rels, layers=layers, spec=spec,
        feature_dim=feature_dim, init_fea_dim=init_fea_dim,
        num_base_r=num_base_r, dropout=0.0,
    )
    alphas = init_alphas(jax.random.key(0), spec, layers)
    variables = model.init(jax.random.key(1), blocks, alphas, False)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, bstats, opt_state, blocks, seed_pos, labels, mask, key):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": bstats},
                blocks, alphas, True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            return nc_loss(logits[seed_pos], labels, mask), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    return train_step, (params, bstats, opt_state), (blocks, seed_pos, labels, mask)


def run_bench_nc(steps: int = 30, warmup: int = 3, **kw) -> dict:
    import jax

    train_step, (params, bstats, opt_state), (blocks, seed_pos, labels, mask) = (
        make_step_nc(**kw)
    )
    key = jax.random.key(2)
    n_edges = int(sum(np.asarray(b.edge_mask).sum() for b in blocks))

    for _ in range(warmup):
        key, k = jax.random.split(key)
        params, bstats, opt_state, loss = train_step(
            params, bstats, opt_state, blocks, seed_pos, labels, mask, k
        )
    float(loss)  # value fetch: a true barrier through the axon tunnel
    # (block_until_ready can return before the remote execution finishes)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, k = jax.random.split(key)
        params, bstats, opt_state, loss = train_step(
            params, bstats, opt_state, blocks, seed_pos, labels, mask, k
        )
    float(loss)  # value fetch: a true barrier through the axon tunnel
    # (block_until_ready can return before the remote execution finishes)
    dt = time.perf_counter() - t0
    return {
        "edges_per_sec": n_edges * steps / dt,
        "step_ms": 1e3 * dt / steps,
        "n_edges_per_step": n_edges,
        "loss": float(loss),
        "device": str(jax.devices()[0]),
    }


def make_step_lptrain(
    score_func: str = "sf_ConvE", batch_size: int = 256,
    max_train_edges: int = 0, dataset: str = "synthetic-fb",
    pallas_agg: bool = False,
):
    """LP retrain train step at exact reference scale: FULL-train-graph
    GNN forward (272,115 FB15k-237 triples = 558,771 edge+self rows per
    layer, recomputed per minibatch exactly as the reference does,
    train/mr_lp_train.py:225-240 / models/model_lp.py:123-137) + the
    1-vs-N decoder + masked BCE-with-logits + backward. ``score_func``
    picks the decoder roofline: sf_ConvE (conv + FC + [B, N] matmul —
    the reference's default retrain head) or sf_DisMult (one [B, N]
    matmul).

    ``max_train_edges`` (0 = no subsampling, the default since round 4:
    the full-graph program compiles in ~36 s XLA + a one-time device-
    side finalization through the axon tunnel — the round-2/3
    'remote-compile budget' blocker is gone) optionally subsamples the
    training graph for quick probes. ``dataset`` picks the workload
    shape: synthetic-fb (14.5k entities, 237 rels) or synthetic-wn
    (40.9k entities, 11 rels — the entity-table-dominated skew)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mr_gnas_tpu.cells import parse_reference_genotypes
    from mr_gnas_tpu.data import load_dataset
    from mr_gnas_tpu.graph import build_rel_graph
    from mr_gnas_tpu.models import LPNetwork, bce_logits_loss

    kg = load_dataset(dataset)
    train = kg.train
    if max_train_edges and len(train) > max_train_edges:
        train = train[
            np.random.default_rng(0).choice(
                len(train), max_train_edges, replace=False
            )
        ]
    graph = build_rel_graph(train, kg.num_ent, kg.num_rels)
    if pallas_agg:
        # route the aggregators through the Pallas blocked-CSR kernels
        # (fixed graph -> exact CSR, no static padding needed). Also the
        # cold-compile probe arm: the XLA scatter path is the suspected
        # server-compile hog at 544k rows (scripts/fullgraph_probe.py)
        from mr_gnas_tpu.graph.build import attach_csr

        graph = attach_csr(graph)
    geno = parse_reference_genotypes(
        "[Genotype(alpha_cell=[('pre_mult', 1, 0), ('f_sparse_comp', 2, 1), "
        "('f_sparse_comp', 3, 2), ('a_max', 4, 2), ('a_max', 5, 3), "
        "('f_sparse_last', 6, 5), ('f_sparse_last', 7, 5)], "
        f"concat_node=[4, 5, 6, 7], score_func='{score_func}')]"
    )
    model = LPNetwork(
        genotypes=tuple(geno), num_ent=kg.num_ent, num_rels=kg.num_rels,
        feature_dim=128, init_fea_dim=128, num_base_r=23,
        dropout_cell=0.3, drop_aggr=0.1,
        score_args={"embed_dim": 128, "k_w": 8, "k_h": 16,
                    "num_filt": 128, "ker_sz": 8},
    )
    rng = np.random.default_rng(0)
    subj = jnp.asarray(rng.integers(kg.num_ent, size=batch_size).astype(np.int32))
    rel = jnp.asarray(rng.integers(kg.num_rels, size=batch_size).astype(np.int32))
    labels = jnp.asarray(
        (rng.random((batch_size, graph.n_nodes)) < 0.001).astype(np.float32)
    )
    row_mask = jnp.ones((batch_size,))
    col_mask = graph.node_mask
    variables = model.init(jax.random.key(0), graph, subj, subj, False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, bstats, opt_state, graph, subj, rel, labels, row_mask, key):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": bstats}, graph, subj, rel, True,
                mutable=["batch_stats"], rngs={"dropout": key},
                method="logits",
            )
            return (
                bce_logits_loss(logits, labels, row_mask, col_mask),
                mut["batch_stats"],
            )

        (loss, nb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), nb, opt_state, loss

    return train_step, (params, bstats, opt_state), (graph, subj, rel, labels, row_mask)


def run_bench_lptrain(steps: int = 15, warmup: int = 3, **kw) -> dict:
    import jax

    t_build = time.perf_counter()
    train_step, (params, bstats, opt_state), inputs = make_step_lptrain(**kw)
    graph = inputs[0]
    key = jax.random.key(2)
    n_edges = int(np.asarray(graph.edge_mask).sum())

    t_compile = time.perf_counter()
    for _ in range(warmup):
        key, k = jax.random.split(key)
        params, bstats, opt_state, loss = train_step(
            params, bstats, opt_state, *inputs, k
        )
    float(loss)  # value fetch: a true barrier through the axon tunnel
    # (block_until_ready can return before the remote execution finishes)
    compile_s = time.perf_counter() - t_compile  # trace+compile+warmup wall
    t0 = time.perf_counter()
    for _ in range(steps):
        key, k = jax.random.split(key)
        params, bstats, opt_state, loss = train_step(
            params, bstats, opt_state, *inputs, k
        )
    float(loss)  # value fetch: a true barrier through the axon tunnel
    # (block_until_ready can return before the remote execution finishes)
    dt = time.perf_counter() - t0
    return {
        "edges_per_sec": n_edges * steps / dt,
        "step_ms": 1e3 * dt / steps,
        "n_edges_per_step": n_edges,
        "build_s": round(t_compile - t_build, 1),
        "compile_s": round(compile_s, 1),
        "loss": float(loss),
        "device": str(jax.devices()[0]),
    }


def _enable_compile_cache():
    """Persistent compilation cache: the headline program cold-compiles
    in minutes through the axon remote-compile tunnel (NOTES.md); caching
    it in-repo makes repeat bench runs (and the end-of-round driver run)
    pay only device time. Keyed on HLO+flags+jaxlib, so code changes
    invalidate cleanly."""
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__) or ".", ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jaxlib without the persistent cache: run cold


def main():
    import argparse
    import re
    import subprocess
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--task", default="lp", choices=("lp", "nc", "lptrain-conve", "lptrain-dismult"),
        help="lp: headline LP supernet step; nc: NC supernet over 2-hop "
        "blocks at AIFB-like scale; lptrain-*: the retrain step over the "
        "FULL training graph at exact reference scale with the ConvE / "
        "DisMult 1-vs-N decoder",
    )
    ap.add_argument(
        "--lptrain-dataset", default="synthetic-fb",
        choices=("synthetic-fb", "synthetic-wn"),
        help="workload shape for lptrain-*: FB15k-237 (14.5k ents, 237 "
        "rels, 544k edge rows) or WN18RR (40.9k ents, 11 rels — the "
        "entity-table-dominated skew)",
    )
    ap.add_argument(
        "--max-train-edges", type=int, default=0,
        help="lptrain-*: subsample the training graph (0 = full graph)",
    )
    ap.add_argument(
        "--no-nc", action="store_true",
        help="skip the NC sub-benchmark in the default lp run",
    )
    ap.add_argument(
        "--no-driver", action="store_true",
        help="skip the driver-level search throughput sub-benchmark",
    )
    ap.add_argument(
        "--spmd", action="store_true",
        help="run the headline config through the driver's manual-SPMD "
        "(shard_map) path on a 1-device mesh instead of the plain program",
    )
    ap.add_argument(
        "--headline-only", action="store_true",
        help="measure only the headline config (no NC, no fixed-workload "
        "re-measurement) — for probing config variants one per process",
    )
    ap.add_argument(
        "--graph-batch", type=int, default=131072,
        help="edge batch for the lp headline config (probe variants with "
        "--headline-only; 131072 is the recorded headline)",
    )
    ap.add_argument(
        "--shape", default="fb", choices=("fb", "wn"),
        help="lp supernet workload shape: fb = FB15k-237 (14541 ents, "
        "237 rels), wn = WN18RR (40943 ents, 11 rels — the node-section/"
        "entity-table-dominated skew)",
    )
    args = ap.parse_args()
    _enable_compile_cache()
    if args.task == "nc":
        out = run_bench_nc()
        print(
            json.dumps(
                {
                    "metric": "nc_supernet_fwd_bwd_throughput",
                    "value": round(out["edges_per_sec"], 1),
                    "unit": "edges/sec/chip",
                    "vs_baseline": 1.0,
                    "detail": out,
                }
            )
        )
        return
    if args.task.startswith("lptrain-"):
        sf = "sf_ConvE" if args.task.endswith("conve") else "sf_DisMult"
        out = run_bench_lptrain(
            score_func=sf, dataset=args.lptrain_dataset,
            max_train_edges=args.max_train_edges,
        )
        print(
            json.dumps(
                {
                    "metric": f"lp_retrain_step_throughput_{sf}",
                    "value": round(out["edges_per_sec"], 1),
                    "unit": "edges/sec/chip",
                    "vs_baseline": 1.0,
                    "detail": out,
                }
            )
        )
        return
    # headline: the tuned TPU configuration (bf16 compute in the fused
    # cells, 128k-edge sampled graphs — larger search batches amortize the
    # node-section rows AND are higher-fidelity search steps; see
    # NOTES.md round-2 roofline; 65536 is the latency-friendly point at
    # ~86% of this peak). The round-1 fixed workload (f32, 4096) is
    # re-measured into detail.fixed_workload for continuity.
    # grouped_neg: the driver-default grouped negative layout
    # (data/sampling.negative_sampling_grouped) — same BCE objective,
    # ~2x fewer entity gather/scatter rows. pallas_agg + megakernel: the
    # fused gather+compose+reduce kernel over the statically-padded CSR
    # and the BN-mix stage mega-kernel — both auto-on in the lp-search
    # driver on TPU backends. neg_chunk=1024: chunk-shared negatives
    # (lp-search --neg-chunk; data/sampling.negative_sampling_chunked)
    # turn the negative score slabs + P*n-row grad scatter into batched
    # MXU matmuls — +25% measured, same per-positive negative count.
    # (The per-positive grouped layout measures ~870-904k standalone,
    # NOTES.md; it is NOT re-measured here because a second 131k-config
    # run in the same process under-reports by ~35% — leftover device
    # allocations from the first program degrade it. One process, one
    # measured config.)
    # the NC benchmark runs FIRST and in a SUBPROCESS: a second measured
    # config in one process under-reports (leftover device allocations,
    # NOTES.md round-2 measurement note), and the axon TPU tunnel is
    # single-tenant — the child must finish before the parent grabs it
    nc_result = None
    if not args.no_nc and not args.headline_only:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--task", "nc"],
                capture_output=True, text=True, timeout=1800,
            )
            line = [
                l for l in proc.stdout.splitlines() if l.startswith("{")
            ][-1]
            nc = json.loads(line)
            nc_result = {
                "edges_per_sec": nc["value"],
                "step_ms": nc["detail"]["step_ms"],
                "config": "2-hop blocks, AIFB-like scale (8.2k nodes, 90 rels, d=64)",
            }
        except Exception as e:  # the LP headline must survive an NC hiccup
            nc_result = {"error": f"{type(e).__name__}: {e}"}

    shape_kw = (
        {} if args.shape == "fb" else {"num_ent": 40943, "num_rels": 11}
    )
    out = run_bench(
        bf16=True, graph_batch=args.graph_batch, grouped_neg=True,
        pallas_agg=True, megakernel=True, neg_chunk=1024, spmd=args.spmd,
        **shape_kw,
    )
    if args.shape != "fb":
        out["config"] = "wn shape (40943 ents, 11 rels)"
    if not args.headline_only:
        # 50 steps: at ~15 ms/step the 20-step timing is visibly polluted
        # by tunnel launch latency (measured 147k vs 276k back-to-back)
        fixed = run_bench(bf16=False, graph_batch=4096, steps=50)
        out["fixed_workload"] = {
            "edges_per_sec": round(fixed["edges_per_sec"], 1),
            "step_ms": round(fixed["step_ms"], 3),
            "config": "f32, graph_batch 4096 (round-1 headline config)",
        }
    if nc_result is not None:
        out["nc"] = nc_result

    if not args.headline_only and not args.no_driver:
        # DRIVER-level search throughput (not just the jitted step): a
        # 300-epoch dress-config search through the real lp-search driver
        # (--steps-per-call auto=8, wire format, pipelined chunk fetch —
        # the round-5 host-path work). Subprocess: one process, one
        # measured config, and the tunnel is single-tenant. epochs=300
        # matches the cached search HLO (the cosine length is baked in).
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "mr_gnas_tpu.cli", "lp-search",
                 "--compile-cache", ".jax_cache",
                 "--dataset", "synthetic-fb", "--epochs", "300",
                 "--warm-epochs", "10", "--max-patience", "500",
                 "--feature-dim", "200", "--init-fea-dim", "100",
                 "--num-base-r", "475", "--graph-batch-size", "131072",
                 "--graph-batch-size-val", "16384",
                 "--save-dir", "/tmp/bench-driver", "--log-every", "100",
                 "--save-model-freq", "1000"],
                capture_output=True, text=True, timeout=1500,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            m = re.findall(r"'edges_per_sec': ([0-9.]+)", proc.stdout)
            out["search_driver"] = {
                "edges_per_sec": round(float(m[-1]), 1),
                "config": "dress config (131k batch), 300 epochs through "
                          "the lp-search driver, steps-per-call auto",
            }
        except Exception as e:  # the headline must survive a driver hiccup
            out["search_driver"] = {"error": f"{type(e).__name__}: {e}"}

    baseline_path = os.path.join(os.path.dirname(__file__) or ".", "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("edges_per_sec"):
            vs = out["edges_per_sec"] / base["edges_per_sec"]
    print(
        json.dumps(
            {
                "metric": "lp_supernet_fwd_bwd_throughput",
                "value": round(out["edges_per_sec"], 1),
                "unit": "edges/sec/chip",
                "vs_baseline": round(vs, 4),
                "detail": out,
            }
        )
    )


if __name__ == "__main__":
    main()
