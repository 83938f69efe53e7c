"""LP fixed-genotype retrain driver (train/mr_lp_train.py analog).

Full-train-graph GNN forward + 1-vs-N decoder per minibatch of (s, r)
queries, BCE against label-smoothed multi-hot targets
(train/mr_lp_train.py:225-240), filtered ranking eval each epoch with
best-MRR checkpointing (:193-201) and resume (:126-130).
"""
from __future__ import annotations

import functools

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mr_gnas_tpu.cells import Genotype, genotypes_from_json, parse_reference_genotypes
from mr_gnas_tpu.data import load_dataset, process
from mr_gnas_tpu.data.labels import iterate_batches
from mr_gnas_tpu.graph import build_rel_graph
from mr_gnas_tpu.models import LPNetwork, bce_logits_loss
from mr_gnas_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from mr_gnas_tpu.train.config import LPTrainConfig
from mr_gnas_tpu.train.eval import (
    accumulate_rank_results,
    combine_results,
    filtered_ranks,
)
from mr_gnas_tpu.train.metrics import (
    ScalarLogger,
    Throughput,
    count_parameters,
    setup_logging,
    setup_run_dir,
)


def parse_genotypes(s: str) -> list[Genotype]:
    """Accept JSON (ours) or the reference's Python-literal format."""
    s = s.strip()
    if not s:
        raise ValueError("--genotype is required")
    if s.startswith("[{") or s.startswith("{"):
        return genotypes_from_json(s if s.startswith("[") else f"[{s}]")
    return parse_reference_genotypes(s)


def run_lp_train(cfg: LPTrainConfig, max_epochs: int | None = None) -> dict:
    run_dir = setup_run_dir(cfg.save_dir, f"lp-train-{cfg.dataset}")
    log = setup_logging(run_dir)
    scalars = ScalarLogger(run_dir)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    # distribution (SURVEY §2.9): the manual-SPMD path (dist/spmd.py) —
    # each device owns contiguous slices of the relation-sorted edge
    # sections plus one node block; the compiled cells merge aggregation
    # partials with reduce-scatter / all-to-all-max, BN stats psum, one
    # all-gather per layer rebuilds the node table, and the (s, r) query
    # batch rows shard over the same axis (the DP analog), splitting the
    # [B, N] 1-vs-N decode and the filtered ranking per device.
    mesh = None
    data_n = 1
    model_n = 1
    if cfg.mesh_shape:
        from mr_gnas_tpu.dist import make_mesh, replicate

        mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
        data_n = mesh.shape.get("data", 1)
        model_n = mesh.shape.get("model", 1)
        if cfg.batch_size % data_n:
            raise ValueError(
                f"--batch-size {cfg.batch_size} must be divisible by the "
                f"data axis {data_n} under --mesh-shape"
            )
        log.info(
            "mesh: %s (manual-SPMD edge partitioning%s)", dict(mesh.shape),
            "; eval decode column-sharded over 'model'" if model_n > 1 else "",
        )

    kg = load_dataset(cfg.dataset, cfg.data_root)
    triplets = process(
        {"train": kg.train, "valid": kg.valid, "test": kg.test}, kg.num_rels
    )
    # full train graph — exact static size unless sharding needs pads
    # (node count must divide into data-axis blocks AND, when the model
    # axis is active, into entity-column shards for the TP-analog decode)
    graph = build_rel_graph(
        kg.train, kg.num_ent, kg.num_rels,
        pad_multiple=int(np.lcm(data_n, model_n)),
    )
    graph_dev = graph  # what the steps consume (local-stacked under a mesh)
    if mesh is not None:
        from mr_gnas_tpu.dist.spmd import build_local_graph, shard_local_tree

        graph_dev = shard_local_tree(
            build_local_graph(graph, data_n, pallas_csr=cfg.pallas_agg), mesh
        )
    elif cfg.pallas_agg:
        from mr_gnas_tpu.graph.build import attach_csr

        graph_dev = attach_csr(graph)
    genotypes = parse_genotypes(cfg.genotype)
    log.info("genotypes: %s", [g.to_reference_str() for g in genotypes])

    model = LPNetwork(
        genotypes=tuple(genotypes),
        num_ent=kg.num_ent,
        num_rels=kg.num_rels,
        feature_dim=cfg.feature_dim,
        init_fea_dim=cfg.init_fea_dim,
        num_base_r=cfg.num_base_r,
        dropout_cell=cfg.dropout_cell,
        drop_aggr=cfg.drop_aggr,
        score_args=cfg.score_args(),
    )
    subj0 = jnp.zeros((cfg.batch_size,), jnp.int32)
    variables = model.init(jax.random.key(cfg.seed), graph, subj0, subj0, False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    if mesh is not None:
        # replicated model state; the shard_map'd steps keep it that way
        # (grads auto-psum, BN statistics psum inside the cells)
        params, bstats = replicate((params, bstats), mesh)
    log.info("param size = %.3fMB", count_parameters(params) * 4 / 1e6)

    epochs = max_epochs or cfg.epochs
    # CosineAnnealingLR(T_max=epochs) stepped per EPOCH, as in the
    # reference (train/mr_lp_train.py:144,253): piecewise-constant within
    # an epoch. The optimizer count ticks per batch, so divide it down.
    steps_per_epoch = max(
        -(-len(triplets["train"]) // cfg.batch_size), 1
    )
    epoch_cos = optax.cosine_decay_schedule(
        cfg.learning_rate, epochs, alpha=cfg.learning_rate_min / cfg.learning_rate
    )

    def lr_schedule(count):
        return epoch_cos(count // steps_per_epoch)
    if cfg.optimizer.lower() == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
            optax.sgd(lr_schedule, momentum=cfg.momentum),
        )
    else:
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
            optax.adam(lr_schedule),
        )
    opt_state = tx.init(params)

    start_epoch = 0
    if cfg.checkpoint:
        # exact resume: params + BN stats + optimizer state (momentum /
        # Adam moments AND the cosine-schedule step count live in
        # opt_state, so the LR schedule continues where it left off)
        state, meta = load_checkpoint(
            cfg.checkpoint,
            {"params": params, "batch_stats": bstats, "opt_state": opt_state},
        )
        params, bstats = state["params"], state["batch_stats"]
        opt_state = state["opt_state"]
        start_epoch = (meta or {}).get("epoch", -1) + 1
        log.info("resuming at epoch %s from %s", start_epoch, cfg.checkpoint)

    col_mask = graph.node_mask  # excludes padded entity columns

    # mask-weighted BCE: padded final-batch rows and padded entity
    # columns are excluded from the mean exactly (the reference's
    # tensors are unpadded). The loss consumes raw decoder LOGITS
    # (bce_logits_loss): same value as the reference's BCELoss-on-
    # sigmoid, but the gradient survives decoder saturation (the probs
    # form's eps-clip stalls ConvE — NOTES round-3).
    from mr_gnas_tpu.data.labels import (
        labels_from_ids,
        labels_from_ids_cols,
        smooth_labels,
    )

    # labels arrive as packed [B, K] object-id rows (iterate_batches
    # sparse_pad_id, K = max fan-out ~15 — ~1000x fewer tunnel/PCIe
    # bytes than the [B, num_ent] multi-hot, the dominant transfer of
    # every step, round-5); the exact multi-hot and its smoothing are
    # rebuilt on device (labels_from_ids + smooth_labels)
    def _train_loss(params, bstats, g, subj, rel, obj_ids, row_mask, cmask, dkey, axis):
        logits, mut = model.apply(
            {"params": params, "batch_stats": bstats},
            g, subj, rel, True,
            mutable=["batch_stats"], rngs={"dropout": dkey},
            method="logits",
        )
        lab = smooth_labels(
            labels_from_ids(obj_ids, graph.n_nodes), cfg.lbl_smooth, kg.num_ent
        )
        l = bce_logits_loss(logits, lab, row_mask, cmask, axis=axis)
        return l, mut["batch_stats"]

    def _eval_body(params, bstats, g, subj, rel, obj, obj_ids, cmask, axis):
        logits = model.apply(
            {"params": params, "batch_stats": bstats}, g, subj, rel, False,
            method="logits",
        )
        labels = labels_from_ids(obj_ids, graph.n_nodes)
        loss = bce_logits_loss(logits, labels, None, cmask, axis=axis)
        # ranking on logits == ranking on probs (sigmoid is monotone);
        # row-sharded under SPMD: each device ranks its (s, r) query
        # slice against the full entity axis — no [B, N] score matrix
        # ever lives on one device
        ranks = filtered_ranks(logits, labels, obj, cmask)
        return ranks, loss

    if mesh is None:
        train_loss_fn = functools.partial(_train_loss, axis=None)
        eval_body = functools.partial(_eval_body, axis=None)
    else:
        from jax.sharding import PartitionSpec as P

        from mr_gnas_tpu.dist.spmd import local_view

        gspec = jax.tree.map(lambda _: P("data"), graph_dev)

        def train_loss_fn(params, bstats, gstack, subj, rel, labels, row_mask, cmask, dkey):
            def f(params, bstats, gstack, subj, rel, labels, row_mask, cmask, dkey):
                g = local_view(gstack)
                dk = jax.random.fold_in(dkey, jax.lax.axis_index("data"))
                return _train_loss(
                    params, bstats, g, subj, rel, labels, row_mask, cmask, dk,
                    axis="data",
                )

            return jax.shard_map(
                f, mesh=mesh,
                in_specs=(P(), P(), gspec, P("data"), P("data"), P("data"),
                          P("data"), P(), P()),
                out_specs=(P(), P()),
            )(params, bstats, gstack, subj, rel, labels, row_mask, cmask, dkey)

        n_cols = graph.n_nodes // model_n

        def eval_body(params, bstats, gstack, subj, rel, obj, obj_ids, cmask):
            def f(params, bstats, gstack, subj, rel, obj, obj_ids, cmask):
                g = local_view(gstack)
                if model_n == 1:
                    return _eval_body(
                        params, bstats, g, subj, rel, obj, obj_ids, cmask,
                        axis="data",
                    )
                # TP analog (SURVEY §2.9): the 1-vs-N decode scores this
                # device's entity-column block only (logits_cols slices
                # the encoded table), the label multi-hot is rebuilt
                # column-sharded from the packed ids, and the filtered
                # ranking is a per-shard count + psum over 'model' —
                # no [B, N] score row anywhere.
                from mr_gnas_tpu.train.eval import filtered_ranks_cols

                logits = model.apply(
                    {"params": params, "batch_stats": bstats},
                    g, subj, rel, n_cols, "model", False,
                    method="logits_cols",
                )
                labels = labels_from_ids_cols(
                    obj_ids, n_cols, jax.lax.axis_index("model") * n_cols
                )
                loss = bce_logits_loss(
                    logits, labels, None, cmask, axis="data", col_axis="model"
                )
                ranks = filtered_ranks_cols(logits, labels, obj, cmask, "model")
                return ranks, loss

            cspec = P() if model_n == 1 else P("model")
            return jax.shard_map(
                f, mesh=mesh,
                in_specs=(P(), P(), gspec, P("data"), P("data"), P("data"),
                          P("data"), cspec),
                out_specs=(P("data"), P()),
            )(params, bstats, gstack, subj, rel, obj, obj_ids, cmask)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, bstats, opt_state, graph, subj, rel, labels, row_mask, dkey):
        def loss_fn(p):
            return train_loss_fn(
                p, bstats, graph, subj, rel, labels, row_mask, col_mask, dkey
            )

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    # device-side training loop (--steps-per-call K): lax.scan K
    # optimizer steps in ONE jitted call — the K packed label-id blocks
    # ship as a single [K, B, fanout] transfer and the host pays one
    # dispatch per K steps instead of per step. Same math as the per-step loop: the
    # scan body is train_step's computation and the dropout key is the
    # same fold_in(epoch_key, global_step); results agree to XLA
    # schedule-level float noise (equivalence-tested). Works under a
    # mesh too (round-5): the scan body IS the shard_map'd step — the
    # stacked [K, B, ...] label blocks ship unsharded and the in_specs
    # reshard each sliced step, identically to the per-step path.
    spc = int(getattr(cfg, "steps_per_call", 1))
    if spc < 0:
        # auto: 8 on TPU (remote-tunnel regime), 1 elsewhere — EXCEPT at
        # full-graph scale, where the scan-wrapped program is compile-
        # pathological (>45 min server compile at 558k rows, NOTES
        # round-5 measured negative) and the K=1 driver already runs at
        # its jitted step rate (sparse labels + prefetch), so K>1 has
        # nothing left to recover.
        big = graph.n_edge_rows > (1 << 18)
        spc = 8 if jax.default_backend() == "tpu" and not big else 1
    spc = max(1, spc)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_steps(params, bstats, opt_state, graph, subjs, rels, labels,
                    row_masks, key, step0):
        def body(carry, xs):
            p, bs, os = carry
            subj, rel, lab, rm, st = xs
            dk = jax.random.fold_in(key, st)

            def loss_fn(pp):
                return train_loss_fn(
                    pp, bs, graph, subj, rel, lab, rm, col_mask, dk
                )

            (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, os = tx.update(grads, os, p)
            return (optax.apply_updates(p, updates), nbs, os), loss

        steps = step0 + jnp.arange(subjs.shape[0])
        (params, bstats, opt_state), losses = jax.lax.scan(
            body, (params, bstats, opt_state),
            (subjs, rels, labels, row_masks, steps),
        )
        return params, bstats, opt_state, losses

    @jax.jit
    def eval_step(params, bstats, graph, subj, rel, obj, labels):
        return eval_body(params, bstats, graph, subj, rel, obj, labels, col_mask)

    # encode-once eval (single-device path): the encoder output is
    # query-independent, so each infer() runs the full-graph encode ONE
    # time and the per-batch step is just gather+score+rank — the same
    # hoist serve.Predictor applies. At FB15k-237 scale this removes
    # ~150 full-graph forwards per valid+test pass. The mesh path keeps
    # the fused per-batch body (its encoder is shard_map'd with the
    # graph; the hoist would need a second sharded program).
    if mesh is None:

        @jax.jit
        def encode_step(params, bstats, graph):
            return model.apply(
                {"params": params, "batch_stats": bstats}, graph, False,
                method="encode",
            )

        @jax.jit
        def score_step(params, bstats, ent_emb, rel_embed, subj, rel, obj, obj_ids):
            logits = model.apply(
                {"params": params, "batch_stats": bstats},
                ent_emb, rel_embed, subj, rel, False, method="logits_from",
            )
            labels = labels_from_ids(obj_ids, graph.n_nodes)
            loss = bce_logits_loss(logits, labels, None, col_mask, axis=None)
            ranks = filtered_ranks(logits, labels, obj, col_mask)
            return ranks, loss

    else:
        # mesh encode-once (round-5): a second sharded program runs the
        # shard_map'd encoder ONCE per infer pass — the per-layer
        # all-gather leaves (ent_emb, rel_embed) replicated, so
        # out_specs=P() is exact — then the per-batch program is just
        # gather+score+rank: row-sharded over 'data' and, when the model
        # axis is active, column-sharded over 'model' (logits_from_cols).
        # This removes the full-graph re-encode per eval batch that the
        # single-device path already eliminated (the reference re-encodes
        # per batch, train/mr_lp_train.py:289-294).
        from jax.sharding import PartitionSpec as _P

        @jax.jit
        def encode_step(params, bstats, gstack):
            def f(params, bstats, gstack):
                g = local_view(gstack)
                return model.apply(
                    {"params": params, "batch_stats": bstats}, g, False,
                    method="encode",
                )

            # check_vma off: the encoder's final all_gather makes
            # (ent_emb, rel_embed) truly replicated over 'data', but the
            # static varying-axes analysis cannot infer that through the
            # gather — the replicated out_specs are semantically exact
            # (rank equality vs single-device is asserted in tests)
            return jax.shard_map(
                f, mesh=mesh, in_specs=(_P(), _P(), gspec),
                out_specs=(_P(), _P()), check_vma=False,
            )(params, bstats, gstack)

        @jax.jit
        def score_step(params, bstats, ent_emb, rel_embed, subj, rel, obj, obj_ids):
            def f(params, bstats, ent_emb, rel_embed, subj, rel, obj, obj_ids, cmask):
                if model_n == 1:
                    logits = model.apply(
                        {"params": params, "batch_stats": bstats},
                        ent_emb, rel_embed, subj, rel, False,
                        method="logits_from",
                    )
                    labels = labels_from_ids(obj_ids, graph.n_nodes)
                    loss = bce_logits_loss(logits, labels, None, cmask, axis="data")
                    ranks = filtered_ranks(logits, labels, obj, cmask)
                    return ranks, loss
                from mr_gnas_tpu.train.eval import filtered_ranks_cols

                logits = model.apply(
                    {"params": params, "batch_stats": bstats},
                    ent_emb, rel_embed, subj, rel, n_cols, "model", False,
                    method="logits_from_cols",
                )
                labels = labels_from_ids_cols(
                    obj_ids, n_cols, jax.lax.axis_index("model") * n_cols
                )
                loss = bce_logits_loss(
                    logits, labels, None, cmask, axis="data", col_axis="model"
                )
                ranks = filtered_ranks_cols(logits, labels, obj, cmask, "model")
                return ranks, loss

            cspec = _P() if model_n == 1 else _P("model")
            return jax.shard_map(
                f, mesh=mesh,
                in_specs=(_P(), _P(), _P(), _P(), _P("data"), _P("data"),
                          _P("data"), _P("data"), cspec),
                out_specs=(_P("data"), _P()),
            )(params, bstats, ent_emb, rel_embed, subj, rel, obj, obj_ids, col_mask)

    from mr_gnas_tpu.train.metrics import prefetched

    def _to_eval_arrays(batch):
        trip, obj_ids, mask = batch
        return (
            jnp.asarray(trip[:, 0]), jnp.asarray(trip[:, 1]),
            jnp.asarray(trip[:, 2]), jnp.asarray(obj_ids), mask,
        )

    def predict(qs, enc=None):
        results, losses = {}, []
        # labels travel as packed [B, K] object-id rows (pad id =
        # graph.n_nodes -> the device scatter's throwaway column) and
        # are rebuilt on device — the [B, num_ent] block never crosses
        # the host link; sampling/packing runs ahead (prefetched)
        for subj, rel, obj, labels, mask in prefetched(
            iterate_batches(
                qs, kg.num_ent, cfg.batch_size, sparse_pad_id=graph.n_nodes
            ),
            _to_eval_arrays,
        ):
            if enc is None:
                ranks, loss = eval_step(
                    params, bstats, graph_dev, subj, rel, obj, labels
                )
            else:
                ranks, loss = score_step(
                    params, bstats, enc[0], enc[1], subj, rel, obj, labels
                )
            n_real = int(mask.sum())
            results = accumulate_rank_results(np.asarray(ranks)[:n_real], results)
            losses.append(float(loss))
        return results, float(np.sum(losses))

    def infer(tag, epoch):
        enc = None if encode_step is None else encode_step(params, bstats, graph_dev)
        left, l_loss = predict(triplets[f"{tag}_tail"], enc)
        right, r_loss = predict(triplets[f"{tag}_head"], enc)
        res = combine_results(left, right)
        loss = 0.5 * (l_loss + r_loss)
        log.info(
            "%s_Epoch %04d | Loss %.4f | MR %.3f | MRR %.4f | H@1 %.4f H@3 %.4f H@10 %.4f",
            tag, epoch, loss, res["mr"], res["mrr"],
            res["hits@1"], res["hits@3"], res["hits@10"],
        )
        return res, loss

    best = {"mrr": 0.0, "epoch": -1, "hits@10": 0.0, "hits@1": 0.0}
    thr = Throughput()
    n_edges = int(np.asarray(graph.row_mask).sum())
    final_test = {}
    for epoch in range(start_epoch, epochs):
        # per-epoch derived RNG: shuffles and dropout depend only on
        # (seed, epoch, step), so a resumed run continues bit-exactly
        rng = np.random.default_rng([cfg.seed, epoch])
        key = jax.random.fold_in(jax.random.key(cfg.seed + 7), epoch)
        ep_losses = []  # device scalars; ONE fetch per epoch (a per-step
        # float(loss) would sync the dispatch pipeline every step)

        def _to_train_arrays(batch):
            trip, obj_ids, mask = batch
            return (
                jnp.asarray(trip[:, 0]), jnp.asarray(trip[:, 1]),
                jnp.asarray(obj_ids), jnp.asarray(mask),
            )

        batches = iterate_batches(
            triplets["train"], kg.num_ent, cfg.batch_size,
            shuffle=True, rng=rng, sparse_pad_id=graph.n_nodes,
        )
        if spc == 1:
            for step, (subj, rel, labels, mask) in enumerate(
                prefetched(batches, _to_train_arrays)
            ):
                dkey = jax.random.fold_in(key, step)
                params, bstats, opt_state, loss = train_step(
                    params, bstats, opt_state, graph_dev, subj, rel, labels,
                    mask, dkey,
                )
                ep_losses.append(loss)
                thr.step(n_edges)
        else:

            def _chunks(it, k):
                buf = []
                for x in it:
                    buf.append(x)
                    if len(buf) == k:
                        yield buf
                        buf = []
                if buf:
                    yield buf

            def _to_train_chunk(bufs):
                trips = [b[0] for b in bufs]
                return (
                    jnp.asarray(np.stack([t[:, 0] for t in trips])),
                    jnp.asarray(np.stack([t[:, 1] for t in trips])),
                    jnp.asarray(np.stack([b[1] for b in bufs])),
                    jnp.asarray(np.stack([b[2] for b in bufs])),
                    len(bufs),
                )

            step = 0
            for subjs, rels, labs, rms, k in prefetched(
                _chunks(batches, spc), _to_train_chunk
            ):
                if k == spc:
                    params, bstats, opt_state, losses = train_steps(
                        params, bstats, opt_state, graph_dev, subjs, rels,
                        labs, rms, key, step,
                    )
                    ep_losses.append(jnp.sum(losses))
                else:
                    # remainder chunk: per-step fallback on the
                    # single-step program (same math)
                    for i in range(k):
                        dkey = jax.random.fold_in(key, step + i)
                        params, bstats, opt_state, loss = train_step(
                            params, bstats, opt_state, graph_dev, subjs[i],
                            rels[i], labs[i], rms[i], dkey,
                        )
                        ep_losses.append(loss)
                step += k
                thr.step(n_edges * k)
        train_loss = float(jnp.sum(jnp.stack(ep_losses))) if ep_losses else 0.0
        scalars.log(epoch, train_loss=train_loss, edges_per_sec=thr.edges_per_sec)
        log.info("Train_Epoch %04d | Loss %.4f | %.0f edges/s", epoch, train_loss, thr.edges_per_sec)

        if cfg.finite_check_every and epoch % max(1, cfg.finite_check_every // 10) == 0:
            # lp-train epochs are many steps, so check every epoch-ish
            from mr_gnas_tpu.train.metrics import guard_finite

            guard_finite(
                train_loss, epoch, log,
                save_fn=lambda: save_checkpoint(
                    os.path.join(run_dir, "abort_state.msgpack"),
                    {"params": params, "batch_stats": bstats, "opt_state": opt_state},
                    {"epoch": epoch, "reason": "non-finite loss"},
                ),
            )

        # periodic checkpointing is decoupled from eval cadence: with
        # --eval-every E the eval guard below skips most epochs, but
        # resume points must still land every save_model_freq epochs
        if epoch % cfg.save_model_freq == 0 and epoch > 1:
            save_checkpoint(
                os.path.join(run_dir, f"model_{epoch}.msgpack"),
                {"params": params, "batch_stats": bstats, "opt_state": opt_state},
                {"epoch": epoch},
            )

        # final-epoch eval compares against the EFFECTIVE bound (epochs =
        # max_epochs or cfg.epochs), so truncated runs still eval last
        if epoch % max(1, cfg.eval_every) and epoch != epochs - 1:
            continue
        val_res, val_loss = infer("valid", epoch)
        test_res, test_loss = infer("test", epoch)
        final_test = test_res
        scalars.log(
            epoch, val_mrr=val_res["mrr"], test_mrr=test_res["mrr"],
            test_hits1=test_res["hits@1"], test_hits10=test_res["hits@10"],
        )
        if test_res["hits@1"] > best["hits@1"]:
            best["hits@1"] = test_res["hits@1"]
        if test_res["hits@10"] > best["hits@10"]:
            best["hits@10"] = test_res["hits@10"]
        if test_res["mrr"] > best["mrr"]:
            best.update(mrr=test_res["mrr"], epoch=epoch)
            save_checkpoint(
                os.path.join(run_dir, "model_best_mrr.msgpack"),
                {"params": params, "batch_stats": bstats, "opt_state": opt_state},
                {"epoch": epoch, "mrr": best["mrr"]},
            )
    log.info("Best_epoch_mrr %04d | mrr %.4f", best["epoch"], best["mrr"])
    scalars.close()
    return {
        "best": best,
        "test": final_test,
        "run_dir": run_dir,
        "edges_per_sec": thr.edges_per_sec,
    }
