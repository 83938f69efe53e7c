"""LP bi-level supernet search driver (search/mr_lp_search.py analog).

One optimization step per "epoch", as in the reference (:187-255): sample
a train and a val subgraph, run the architect's alpha update on the val
batch, then the weight update (SGD momentum + cosine LR + grad clip) on
the train batch. Genotype-stability patience provides early stop
(:169-181). Unlike the reference, alphas are checkpointed, and both the
first-order and (working) second-order architect are available.
"""
from __future__ import annotations

import functools

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mr_gnas_tpu.cells import CellSpec, decode_genotypes, genotypes_to_json, init_alphas
from mr_gnas_tpu.data import (
    generate_sampled_graph_and_labels,
    get_adj_and_degrees,
    load_dataset,
)
from mr_gnas_tpu.graph.build import round_up
from mr_gnas_tpu.models import LPSupernet, lp_search_loss
from mr_gnas_tpu.nas import make_arch_optimizer, sgd_momentum_buffer, unrolled_step
from mr_gnas_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from mr_gnas_tpu.train.config import LPSearchConfig
from mr_gnas_tpu.train.eval import calc_mrr
from mr_gnas_tpu.train.metrics import (
    ScalarLogger,
    Throughput,
    count_parameters,
    setup_logging,
    setup_run_dir,
)


def run_lp_search(cfg: LPSearchConfig, max_steps: int | None = None) -> dict:
    # neg_chunk auto-default (config.py): 1024 on TPU (the headline
    # layout, fidelity-studied), 0 elsewhere; explicit values win
    neg_chunk = (
        (1024 if jax.default_backend() == "tpu" and cfg.grouped_negatives
         else 0)
        if cfg.neg_chunk < 0 else cfg.neg_chunk
    )
    if neg_chunk > 0 and not cfg.grouped_negatives:
        raise ValueError("--neg-chunk requires --grouped-negatives true")
    run_dir = setup_run_dir(cfg.save_dir, f"lp-search-{cfg.dataset}")
    log = setup_logging(run_dir)
    scalars = ScalarLogger(run_dir)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    rng = np.random.default_rng(cfg.seed)

    # distribution: cfg.mesh_shape -> named mesh. The manual-SPMD path
    # (dist/spmd.py): each device owns a contiguous slice of the
    # relation-sorted edge sections plus one node block; cells merge
    # aggregation partials with reduce-scatter / all-to-all-max, BN stats
    # are psum'd, and one all-gather per layer rebuilds the node table —
    # SURVEY §2.9's edge-partitioned aggregation design.
    mesh = None
    data_n = 1
    if cfg.mesh_shape:
        from mr_gnas_tpu.dist import make_mesh, replicate

        mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
        data_n = mesh.shape.get("data", 1)
        log.info("mesh: %s (manual-SPMD edge partitioning)", dict(mesh.shape))

    kg = load_dataset(cfg.dataset, cfg.data_root)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    adj_v, deg_v = get_adj_and_degrees(kg.num_ent, kg.valid)
    n_nodes_pad = cfg.n_nodes_pad or round_up(
        min(2 * cfg.graph_batch_size, kg.num_ent), 64
    )
    n_nodes_pad_val = cfg.n_nodes_pad or round_up(
        min(2 * cfg.graph_batch_size_val, kg.num_ent), 64
    )
    n_nodes_pad = round_up(n_nodes_pad, 2 * data_n)
    n_nodes_pad_val = round_up(n_nodes_pad_val, 2 * data_n)

    # bf16 auto-default: ON for TPU (go/no-go study in NOTES round-3 —
    # identical genotypes + alpha trajectories vs f32 over 500 steps at
    # the 131k config), off for CPU where bf16 is emulated
    use_bf16 = (
        jax.default_backend() == "tpu" if cfg.bf16 < 0 else bool(cfg.bf16)
    )

    # Pallas CSR kernels: on for TPU. Under a mesh each shard gets its own
    # blocked CSR (dist/spmd.build_local_graph) — compiled Mosaic runs
    # fine inside shard_map on TPU; interpret-mode (CPU) cannot trace
    # under shard_map, so CPU meshes use the XLA composite aggregation.
    use_pallas_agg = (
        jax.default_backend() == "tpu"
        if cfg.pallas_agg < 0
        else bool(cfg.pallas_agg)
    )

    def sample(data, bs, adj, deg, pad, rng, raw: bool = False):
        batch = generate_sampled_graph_and_labels(
            data, bs, cfg.graph_split_size, kg.num_rels, adj, deg,
            cfg.negative_sample, cfg.edge_sampler, rng, n_nodes_pad=pad,
            n_fwd_pad=round_up(int(bs * cfg.graph_split_size), data_n),
            grouped=cfg.grouped_negatives, neg_chunk=neg_chunk,
        )
        import dataclasses

        if raw:
            return batch
        if mesh is not None:
            from mr_gnas_tpu.dist.spmd import build_local_batch

            return build_local_batch(batch, mesh, pallas_csr=use_pallas_agg)
        if use_pallas_agg:
            from mr_gnas_tpu.graph.build import attach_csr

            # static_pad: every sampled graph of this config compiles to
            # the same program (kernels/pallas_segment.pad_blocked_csr)
            batch = dataclasses.replace(
                batch, graph=attach_csr(batch.graph, static_pad=True)
            )
        return batch

    spec = CellSpec(
        task="lp",
        zero_nodes=cfg.zero_nodes,
        first_nodes=cfg.first_nodes,
        last_nodes=cfg.last_nodes,
    )
    import jax.numpy as _jnp

    model = LPSupernet(
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        layers=cfg.layers,
        spec=spec,
        feature_dim=cfg.feature_dim,
        init_fea_dim=cfg.init_fea_dim,
        num_base_r=cfg.num_base_r,
        dropout_cell=cfg.dropout_cell,
        drop_aggr=cfg.drop_aggr,
        compute_dtype=_jnp.bfloat16 if use_bf16 else _jnp.float32,
        # auto: ON for TPU, with or without a mesh — bn_mix's stat/apply
        # boundary hosts the cross-shard psum (kernels/bn_mix.py axis
        # arg); the cell itself falls back to the slab path in interpret
        # mode under a mesh (CPU), where Pallas cannot trace in shard_map
        megakernel=(
            jax.default_backend() == "tpu"
            if cfg.megakernel < 0
            else bool(cfg.megakernel)
        ),
    )
    alphas = init_alphas(jax.random.key(cfg.seed), spec, cfg.layers, with_final=True)
    # init on a plain (unsharded) batch: param/stat shapes are identical
    # between the single-device and spmd paths
    batch0 = sample(kg.train, cfg.graph_batch_size, adj, deg, n_nodes_pad, rng, raw=True)
    variables = model.init(jax.random.key(cfg.seed + 1), batch0.graph, alphas, False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    if mesh is not None:
        # replicate model state across every mesh device; the shard_map'd
        # steps below keep it replicated (grads auto-psum, BN stats psum)
        params, bstats, alphas = replicate((params, bstats, alphas), mesh)

    lr_schedule = optax.cosine_decay_schedule(
        cfg.learning_rate, cfg.epochs, alpha=cfg.learning_rate_min / cfg.learning_rate
    )
    w_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
        optax.sgd(lr_schedule, momentum=cfg.momentum),
    )
    w_opt = w_tx.init(params)
    a_tx = make_arch_optimizer(cfg.arch_learning_rate, cfg.arch_weight_decay)
    a_opt = a_tx.init(alphas)

    start_epoch = 0
    if cfg.checkpoint:
        # exact resume: weights, BN stats, alphas AND both optimizer
        # states (incl. the cosine-schedule step inside w_opt)
        state, meta = load_checkpoint(
            cfg.checkpoint,
            {"params": params, "batch_stats": bstats, "alphas": alphas,
             "w_opt": w_opt, "a_opt": a_opt},
        )
        params, bstats, alphas = state["params"], state["batch_stats"], state["alphas"]
        w_opt, a_opt = state["w_opt"], state["a_opt"]
        start_epoch = (meta or {}).get("epoch", -1) + 1
        log.info("resuming search at epoch %s from %s", start_epoch, cfg.checkpoint)
    log.info("param size = %.3fMB", count_parameters(params) * 4 / 1e6)

    # bf16 runs the triplet path (gather + score products + grad
    # scatter-add, the largest fusions of the profiled step) at half
    # bytes; reductions accumulate f32 (models/lp._gather_sro)
    loss_dt = _jnp.bfloat16 if use_bf16 else None

    def score_loss(e, r, alphas, trip, lab):
        sf_w = (
            jax.nn.softmax(alphas["final"][0]) if cfg.search_score_fn else None
        )
        if cfg.grouped_negatives:
            nh, nt = lab
            if neg_chunk > 0:
                from mr_gnas_tpu.models.lp import lp_search_loss_chunked

                return lp_search_loss_chunked(
                    e, r, trip, nh, nt, dtype=loss_dt, sf_weights=sf_w,
                    gamma=cfg.gamma,
                )
            from mr_gnas_tpu.models.lp import lp_search_loss_grouped

            return lp_search_loss_grouped(
                e, r, trip, nh, nt, dtype=loss_dt, sf_weights=sf_w,
                gamma=cfg.gamma,
            )
        if sf_w is not None:
            from mr_gnas_tpu.models.lp import lp_search_loss_sf

            return lp_search_loss_sf(e, r, trip, lab, sf_w, cfg.gamma, dtype=loss_dt)
        return lp_search_loss(e, r, trip, lab, dtype=loss_dt)

    def local_loss_fn(params, bstats, alphas, graph, trip, lab, dkey, training=True):
        out = model.apply(
            {"params": params, "batch_stats": bstats},
            graph, alphas, training,
            mutable=["batch_stats"] if training else [],
            rngs={"dropout": dkey},
        )
        if training:
            (e, r), mut = out
            return score_loss(e, r, alphas, trip, lab), mut["batch_stats"]
        e, r = out
        return score_loss(e, r, alphas, trip, lab), bstats

    if mesh is None:
        loss_fn = local_loss_fn
    else:
        # manual SPMD: the loss runs inside shard_map over the 'data'
        # axis; the cells psum BN statistics and merge middle-stage
        # partials via graph.spmd_axis (dist/spmd.py)
        from mr_gnas_tpu.dist.spmd import make_spmd_loss

        loss_fn = make_spmd_loss(mesh, local_loss_fn)

    @jax.jit
    def arch_step_first(params, bstats, alphas, a_opt, graph, trip, lab, dkey):
        # the val forward advances BN running stats, as the torch modules
        # do during the reference's architect backward (architect_lp.py:49)
        def vloss(a):
            return loss_fn(params, bstats, a, graph, trip, lab, dkey)

        (loss, new_bs), grads = jax.value_and_grad(vloss, has_aux=True)(alphas)
        updates, a_opt = a_tx.update(grads, a_opt, alphas)
        return optax.apply_updates(alphas, updates), a_opt, new_bs, loss

    @jax.jit
    def arch_step_unrolled(
        params, bstats, alphas, a_opt, g_t, t_t, l_t, g_v, t_v, l_v, dkey, eta, mom_buf
    ):
        def tloss(p, a):
            l, _ = loss_fn(p, bstats, a, g_t, t_t, l_t, dkey)
            return l

        def vloss(p, a):
            l, _ = loss_fn(p, bstats, a, g_v, t_v, l_v, dkey)
            return l

        return unrolled_step(
            a_tx, a_opt, alphas, params, tloss, vloss, eta,
            network_momentum=cfg.momentum,
            network_weight_decay=cfg.weight_decay,
            momentum_buf=mom_buf,
            mode=cfg.hvp_mode,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def weight_step(params, bstats, w_opt, alphas, graph, trip, lab, dkey):
        def wloss(p):
            return loss_fn(p, bstats, alphas, graph, trip, lab, dkey)

        (loss, new_bs), grads = jax.value_and_grad(wloss, has_aux=True)(params)
        updates, w_opt = w_tx.update(grads, w_opt, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, w_opt, loss

    # device-side search loop (--steps-per-call K): lax.scan K search
    # epochs (arch + weight step each — the reference's one-optimization-
    # step-per-epoch unit, search/mr_lp_search.py:193-251) in ONE jitted
    # call. The K sampled graphs/batches are statically padded, so they
    # stack into [K, ...] leaves and ship as one transfer; the host pays
    # one dispatch + one packed fetch per K epochs instead of per epoch.
    # Key derivation matches the per-epoch path exactly
    # (split(fold_in(key(seed), epoch))), and the scan emits EVERY
    # epoch's alpha snapshot so genotype-patience decoding is
    # bit-identical. First-order architect, single-device only.
    spc = int(getattr(cfg, "steps_per_call", 1))
    if spc < 0:  # auto: 8 on TPU (round-5 phase study), 1 elsewhere
        spc = 8 if jax.default_backend() == "tpu" else 1
    spc = max(1, spc)
    if spc > 1 and (mesh is not None or cfg.unrolled):
        log.info("steps-per-call: forced to 1 (mesh/unrolled path)")
        spc = 1
    if spc > 1 and cfg.eval_every > 0 and cfg.eval_every % spc:
        log.info(
            "steps-per-call: forced to 1 (--eval-every %d not a multiple)",
            cfg.eval_every,
        )
        spc = 1

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
    def search_epochs(params, bstats, alphas, w_opt, a_opt, base_key, xs):
        from mr_gnas_tpu.train.wire import wire_to_batch

        def body(carry, x):
            params, bstats, alphas, w_opt, a_opt = carry
            w_t, w_v, ep = x
            # narrow wire -> exact original arrays, on device (wire.py)
            g_t, t_t, l_t = wire_to_batch(w_t)
            g_v, t_v, l_v = wire_to_batch(w_v)
            k1, k2 = jax.random.split(jax.random.fold_in(base_key, ep))

            def vloss(a):
                return loss_fn(params, bstats, a, g_v, t_v, l_v, k1)

            (aloss, bstats), agr = jax.value_and_grad(vloss, has_aux=True)(alphas)
            aupd, a_opt = a_tx.update(agr, a_opt, alphas)
            alphas = optax.apply_updates(alphas, aupd)

            def wloss(p):
                return loss_fn(p, bstats, alphas, g_t, t_t, l_t, k2)

            (wl, bstats), wgr = jax.value_and_grad(wloss, has_aux=True)(params)
            wupd, w_opt = w_tx.update(wgr, w_opt, params)
            params = optax.apply_updates(params, wupd)
            # f32 outputs: the packed per-chunk fetch is one f32 buffer
            return (params, bstats, alphas, w_opt, a_opt), (
                wl.astype(jnp.float32), aloss.astype(jnp.float32), alphas
            )

        carry, outs = jax.lax.scan(
            body, (params, bstats, alphas, w_opt, a_opt), xs
        )
        return carry + (outs,)

    # full test graph for optional in-search eval (infer_graph analog);
    # the known-positive filter index is built ONCE (RankFilter), not per
    # eval call
    test_graph = None
    rank_filter = None
    if cfg.eval_every > 0:
        from mr_gnas_tpu.graph import build_rel_graph
        from mr_gnas_tpu.train.eval import RankFilter

        test_graph = build_rel_graph(kg.train, kg.num_ent, kg.num_rels)
        rank_filter = RankFilter(kg.train, kg.valid, kg.test)

    from mr_gnas_tpu.train.metrics import PackedFetch

    fetch_alphas = PackedFetch(alphas)  # one RPC round trip per epoch

    def decoded():
        host_alphas = fetch_alphas(alphas)
        genos = decode_genotypes(host_alphas, spec, cfg.layers)
        if cfg.search_score_fn:
            import dataclasses

            from mr_gnas_tpu.ops.registry import SF_OPS

            sf = SF_OPS[int(np.argmax(host_alphas["final"][0]))]
            genos[-1] = dataclasses.replace(genos[-1], score_func=sf)
        return genos

    best_geno = genotypes_to_json(decoded())
    patience = 0
    thr = Throughput()
    n_steps = max_steps or cfg.epochs
    arch_loss = jnp.zeros(())
    profiler = None

    def make_batches(epoch):
        """Sample + device-transfer one epoch's train/val batches.

        Derived purely from (seed, epoch), so running it on the prefetch
        thread is bit-identical to inline sampling (resume unaffected).
        The jnp.asarray pushes start the host->device transfers here —
        on this rig the axon tunnel's transfer of the ~7 MB batch
        arrays dominates the 131k-config epoch, and the prefetch thread
        overlaps it with the previous epoch's device steps."""
        ep_rng = np.random.default_rng([cfg.seed, epoch])
        batch = sample(kg.train, cfg.graph_batch_size, adj, deg, n_nodes_pad, ep_rng)
        batch_val = sample(
            kg.valid, cfg.graph_batch_size_val, adj_v, deg_v, n_nodes_pad_val, ep_rng
        )
        trip = jnp.asarray(batch.triplets)
        trip_v = jnp.asarray(batch_val.triplets)
        if cfg.grouped_negatives:
            lab = (jnp.asarray(batch.neg_heads), jnp.asarray(batch.neg_tails))
            lab_v = (
                jnp.asarray(batch_val.neg_heads), jnp.asarray(batch_val.neg_tails)
            )
        else:
            lab = jnp.asarray(batch.labels)
            lab_v = jnp.asarray(batch_val.labels)
        if mesh is None:
            # push the graph arrays too (LocalBatch is already on device)
            batch = dataclasses.replace(
                batch, graph=jax.tree.map(jnp.asarray, batch.graph)
            )
            batch_val = dataclasses.replace(
                batch_val, graph=jax.tree.map(jnp.asarray, batch_val.graph)
            )
        return batch, batch_val, trip, trip_v, lab, lab_v

    import concurrent.futures
    import dataclasses

    def chunk_batches(e0):
        """Sample + pack + stack + device-transfer spc epochs from e0.

        Each epoch's arrays are statically padded (identical shapes), so
        they stack into [spc, ...] leaves and the whole chunk ships in
        one transfer batch — in the narrow wire format (train/wire.py):
        ~3.7x fewer bytes than the plain arrays, which is the binding
        constraint through the ~20 MB/s axon tunnel. Derived purely from
        (seed, epoch) like make_batches, so prefetching is bit-identical
        to inline sampling (resume unaffected)."""
        from mr_gnas_tpu.train.wire import batch_to_wire

        def one(e):
            # per-epoch RNG keyed on (seed, epoch): identical streams no
            # matter which worker thread runs it
            ep_rng = np.random.default_rng([cfg.seed, e])
            b = sample(kg.train, cfg.graph_batch_size, adj, deg, n_nodes_pad, ep_rng)
            bv = sample(
                kg.valid, cfg.graph_batch_size_val, adj_v, deg_v,
                n_nodes_pad_val, ep_rng,
            )
            return batch_to_wire(b), batch_to_wire(bv)

        # the numpy-heavy sampling releases the GIL enough that a small
        # worker pool hides it behind the device chunk (measured r5)
        raws = list(sample_pool.map(one, range(e0, e0 + spc)))

        def stack(xs):
            return jax.tree.map(lambda *a: jnp.asarray(np.stack(a)), *xs)

        return (
            stack([wt for wt, _ in raws]),
            stack([wv for _, wv in raws]),
            jnp.arange(e0, e0 + spc, dtype=jnp.int32),
        )

    base_key = jax.random.key(cfg.seed)
    fetch_outs = None  # PackedFetch over (losses, arch_losses, alpha_hist)

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    sample_pool = concurrent.futures.ThreadPoolExecutor(max_workers=4)
    # per-phase wall-clock attribution (logged each log_every window):
    # wait = prefetch stall (sampling + host->device transfer not hidden
    # by compute), steps = arch+weight dispatch-to-dispatch (chunk mode:
    # dispatch + the packed result fetch), decode = alpha fetch +
    # genotype decode (one packed RPC round trip per epoch or chunk)
    phase_s = {"wait": 0.0, "steps": 0.0, "decode": 0.0}

    def _is_chunk(e):
        return spc > 1 and e >= cfg.warm_epochs and e + spc <= n_steps

    def _submit(e):
        if e >= n_steps:
            return None
        if _is_chunk(e):
            return ("chunk", pool.submit(chunk_batches, e))
        return ("one", pool.submit(make_batches, e))

    stop = False
    # chunk-pipelining state: the dispatched-but-not-yet-fetched chunk's
    # (start epoch, outs) — fetching it AFTER dispatching the next chunk
    # hides the packed fetch + genotype decode behind device compute.
    # state_epoch tracks which epoch the CURRENT device state corresponds
    # to (it may be one chunk ahead of the outs being processed), so
    # checkpoints/evals are tagged with the true state epoch and resume
    # stays exact.
    pending_outs = None
    state_epoch = start_epoch - 1

    def process_outs(e0, outs):
        nonlocal fetch_outs, loss, arch_loss, stop, patience, best_geno, phase_s
        _t0 = time.perf_counter()
        if fetch_outs is None:
            fetch_outs = PackedFetch(outs)
        losses_h, alosses_h, alpha_hist = fetch_outs(outs)
        loss = losses_h[-1]
        arch_loss = alosses_h[-1]
        for k in range(spc):
            e = e0 + k
            if cfg.finite_check_every and e % cfg.finite_check_every == 0:
                from mr_gnas_tpu.train.metrics import guard_finite

                guard_finite(
                    float(losses_h[k]), e, log,
                    save_fn=lambda: save_checkpoint(
                        os.path.join(run_dir, "abort_state.msgpack"),
                        {"params": params, "batch_stats": bstats,
                         "alphas": alphas, "w_opt": w_opt, "a_opt": a_opt},
                        {"epoch": state_epoch, "reason": "non-finite loss"},
                    ),
                )
            if e % cfg.log_every == 0:
                n_win = max(cfg.log_every, 1)
                log.info(
                    "Epoch %04d | Loss %.4f | Arch_Loss %.4f | %.0f edges/s | "
                    "wait %.0fms steps %.0fms decode %.0fms /ep",
                    e, float(losses_h[k]), float(alosses_h[k]),
                    thr.edges_per_sec,
                    1e3 * phase_s["wait"] / n_win,
                    1e3 * phase_s["steps"] / n_win,
                    1e3 * phase_s["decode"] / n_win,
                )
                phase_s = {"wait": 0.0, "steps": 0.0, "decode": 0.0}
                scalars.log(
                    e, train_loss=float(losses_h[k]),
                    arch_loss=float(alosses_h[k]),
                    edges_per_sec=thr.edges_per_sec,
                )
            # genotype-patience on this epoch's alpha snapshot —
            # bit-identical decode order vs the per-epoch loop
            host_a = jax.tree.map(lambda x: np.asarray(x[k]), alpha_hist)
            genos = decode_genotypes(host_a, spec, cfg.layers)
            if cfg.search_score_fn:
                from mr_gnas_tpu.ops.registry import SF_OPS

                sf = SF_OPS[int(np.argmax(host_a["final"][0]))]
                genos[-1] = dataclasses.replace(genos[-1], score_func=sf)
            gjson = genotypes_to_json(genos)
            if gjson == best_geno:
                patience += 1
            else:
                patience = 0
                best_geno = gjson
            if patience >= cfg.max_patience:
                log.info("Reached max patience; best genotype %s", best_geno)
                stop = True
                break
        phase_s["decode"] += time.perf_counter() - _t0

        if (
            cfg.eval_every > 0
            and any(
                e > 0 and e % cfg.eval_every == 0
                for e in range(e0, e0 + spc)
            )
            and not stop
        ):
            # chunk mode evaluates the CURRENT device state (possibly one
            # chunk ahead of e0 — the in-search eval is advisory logging,
            # not selection; tagged with the true state epoch)
            ent, rel = model.apply(
                {"params": params, "batch_stats": bstats}, test_graph,
                alphas, False,
            )
            mrr, hit_k = calc_mrr(
                ent, rel, kg.train, kg.valid, kg.test,
                eval_bz=cfg.eval_batch_size, eval_p=cfg.eval_protocol,
                num_ent=kg.num_ent, rank_filter=rank_filter,
            )
            log.info(
                "Eval@%04d | MRR %.4f | H@1 %.4f H@3 %.4f H@10 %.4f",
                state_epoch, mrr, *hit_k,
            )
            scalars.log(state_epoch, test_mrr=mrr, test_hits10=hit_k[2])
        if any(
            e % cfg.save_model_freq == 0 and e > 0
            for e in range(e0, e0 + spc)
        ):
            save_checkpoint(
                os.path.join(run_dir, "search_state.msgpack"),
                {"params": params, "batch_stats": bstats, "alphas": alphas,
                 "w_opt": w_opt, "a_opt": a_opt},
                {"epoch": state_epoch, "genotypes": best_geno},
            )

    def drain_outs():
        nonlocal pending_outs
        if pending_outs is not None:
            e0o, outs_o = pending_outs
            pending_outs = None
            process_outs(e0o, outs_o)

    pending = _submit(start_epoch)
    epoch = start_epoch
    while epoch < n_steps and not stop:
        kind, fut = pending
        if kind == "chunk":
            _t0 = time.perf_counter()
            xs = fut.result()
            phase_s["wait"] += time.perf_counter() - _t0
            pending = _submit(epoch + spc)
            _t0 = time.perf_counter()
            params, bstats, alphas, w_opt, a_opt, outs = search_epochs(
                params, bstats, alphas, w_opt, a_opt, base_key, xs
            )
            phase_s["steps"] += time.perf_counter() - _t0
            state_epoch = epoch + spc - 1
            thr.step(2 * xs[0].n_fwd * spc)
            # fetch/decode the PREVIOUS chunk while this one computes
            drain_outs()
            pending_outs = (epoch, outs)
            epoch += spc
            continue
        drain_outs()
        if stop:
            break
        # optional profiler capture of the first post-compile steps
        if cfg.profile_steps > 0 and epoch == start_epoch + 2:
            jax.profiler.start_trace(os.path.join(run_dir, "profile"))
            profiler = epoch
        if profiler is not None and epoch == profiler + cfg.profile_steps:
            jax.profiler.stop_trace()
            log.info("profiler trace written to %s/profile", run_dir)
            profiler = None
        # per-epoch derived RNG/keys -> resumed runs continue bit-exactly
        k1, k2 = jax.random.split(jax.random.fold_in(jax.random.key(cfg.seed), epoch))
        _t0 = time.perf_counter()
        batch, batch_val, trip, trip_v, lab, lab_v = fut.result()
        phase_s["wait"] += time.perf_counter() - _t0
        pending = _submit(epoch + 1)

        _t0 = time.perf_counter()
        if epoch >= cfg.warm_epochs:
            if cfg.unrolled:
                alphas, a_opt, arch_loss = arch_step_unrolled(
                    params, bstats, alphas, a_opt,
                    batch.graph, trip, lab,
                    batch_val.graph, trip_v, lab_v,
                    k1, lr_schedule(epoch), sgd_momentum_buffer(w_opt),
                )
            else:
                alphas, a_opt, bstats, arch_loss = arch_step_first(
                    params, bstats, alphas, a_opt, batch_val.graph, trip_v, lab_v, k1
                )

        params, bstats, w_opt, loss = weight_step(
            params, bstats, w_opt, alphas, batch.graph, trip, lab, k2
        )
        phase_s["steps"] += time.perf_counter() - _t0
        state_epoch = epoch
        # under a mesh the stacked local graph's n_edge_rows is per-shard
        thr.step(batch.graph.n_edge_rows * (data_n if mesh is not None else 1))

        if cfg.finite_check_every and epoch % cfg.finite_check_every == 0:
            from mr_gnas_tpu.train.metrics import guard_finite

            guard_finite(
                loss, epoch, log,
                save_fn=lambda: save_checkpoint(
                    os.path.join(run_dir, "abort_state.msgpack"),
                    {"params": params, "batch_stats": bstats, "alphas": alphas,
                     "w_opt": w_opt, "a_opt": a_opt},
                    {"epoch": epoch, "reason": "non-finite loss"},
                ),
            )

        if epoch % cfg.log_every == 0:
            n_win = max(cfg.log_every, 1)
            log.info(
                "Epoch %04d | Loss %.4f | Arch_Loss %.4f | %.0f edges/s | "
                "wait %.0fms steps %.0fms decode %.0fms /ep",
                epoch, float(loss), float(arch_loss), thr.edges_per_sec,
                1e3 * phase_s["wait"] / n_win, 1e3 * phase_s["steps"] / n_win,
                1e3 * phase_s["decode"] / n_win,
            )
            phase_s = {"wait": 0.0, "steps": 0.0, "decode": 0.0}
            scalars.log(
                epoch,
                train_loss=float(loss),
                arch_loss=float(arch_loss),
                edges_per_sec=thr.edges_per_sec,
            )

        if cfg.eval_every > 0 and epoch > 0 and epoch % cfg.eval_every == 0:
            ent, rel = model.apply(
                {"params": params, "batch_stats": bstats}, test_graph, alphas, False
            )
            mrr, hit_k = calc_mrr(
                ent, rel, kg.train, kg.valid, kg.test,
                eval_bz=cfg.eval_batch_size, eval_p=cfg.eval_protocol,
                num_ent=kg.num_ent, rank_filter=rank_filter,
            )
            log.info(
                "Eval@%04d | MRR %.4f | H@1 %.4f H@3 %.4f H@10 %.4f",
                epoch, mrr, *hit_k,
            )
            scalars.log(epoch, test_mrr=mrr, test_hits10=hit_k[2])

        if epoch >= cfg.warm_epochs:
            _t0 = time.perf_counter()
            genotypes = genotypes_to_json(decoded())
            phase_s["decode"] += time.perf_counter() - _t0
            if genotypes == best_geno:
                patience += 1
            else:
                patience = 0
                best_geno = genotypes
            if patience >= cfg.max_patience:
                log.info("Reached max patience; best genotype %s", best_geno)
                break

        if epoch % cfg.save_model_freq == 0 and epoch > 0:
            save_checkpoint(
                os.path.join(run_dir, "search_state.msgpack"),
                {"params": params, "batch_stats": bstats, "alphas": alphas,
                 "w_opt": w_opt, "a_opt": a_opt},
                {"epoch": epoch, "genotypes": best_geno},
            )
        epoch += 1

    drain_outs()  # the final in-flight chunk's losses/patience decode
    if profiler is not None:
        jax.profiler.stop_trace()
    pool.shutdown(wait=False, cancel_futures=True)
    sample_pool.shutdown(wait=False, cancel_futures=True)
    genotypes = decoded()
    save_checkpoint(
        os.path.join(run_dir, "search_state.msgpack"),
        {"params": params, "batch_stats": bstats, "alphas": alphas,
         "w_opt": w_opt, "a_opt": a_opt},
        # the true epoch of the saved state: patience stops can leave the
        # state up to one chunk past the decision epoch (chunk pipelining)
        {"epoch": max(state_epoch, start_epoch - 1)
         if stop else n_steps - 1,
         "genotypes": genotypes_to_json(genotypes)},
    )
    with open(os.path.join(run_dir, "genotypes.json"), "w") as f:
        f.write(genotypes_to_json(genotypes))
    log.info("Done. Genotypes: %s", [g.to_reference_str() for g in genotypes])
    scalars.close()
    return {
        "genotypes": genotypes,
        "run_dir": run_dir,
        "edges_per_sec": thr.edges_per_sec,
        "last_loss": float(loss),
    }
