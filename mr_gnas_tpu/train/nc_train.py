"""NC fixed-genotype retrain driver (train/mr_nc_train.py analog).

Trains an :class:`NCNetwork` on seed minibatches with full-neighbor
blocks; reports train/test accuracy (micro == the reference's
"micro/macro", train/mr_nc_train.py:163-168 computes the same quantity
twice — we also report a true macro average) and tracks the best test
accuracy.
"""
from __future__ import annotations

import functools

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mr_gnas_tpu.data import CSRGraph, build_blocks, iterate_seed_batches, load_nc_dataset
from mr_gnas_tpu.models import NCNetwork, nc_loss
from mr_gnas_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from mr_gnas_tpu.train.config import NCTrainConfig
from mr_gnas_tpu.train.lp_train import parse_genotypes
from mr_gnas_tpu.train.metrics import (
    ScalarLogger,
    Throughput,
    count_parameters,
    setup_logging,
    setup_run_dir,
)


def run_nc_train(cfg: NCTrainConfig, max_epochs: int | None = None) -> dict:
    run_dir = setup_run_dir(cfg.save_dir, f"nc-train-{cfg.dataset}")
    log = setup_logging(run_dir)
    scalars = ScalarLogger(run_dir)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    key = jax.random.key(cfg.seed)

    # distribution: blocks' edge rows shard over the 'data' axis (the
    # block edge buckets are powers of two, so the axis size divides)
    mesh = None
    data_n = 1
    if cfg.mesh_shape:
        from mr_gnas_tpu.dist import make_mesh, replicate

        mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
        data_n = mesh.shape.get("data", 1)
        log.info("mesh: %s (manual-SPMD block partitioning)", dict(mesh.shape))

    ds = load_nc_dataset(cfg.dataset, cfg.data_root)
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    genotypes = parse_genotypes(cfg.genotype)
    if len(genotypes) == 1 and cfg.layers > 1:
        genotypes = genotypes * cfg.layers
    log.info("genotypes: %s", [g.to_reference_str() for g in genotypes])

    model = NCNetwork(
        genotypes=tuple(genotypes),
        num_nodes=ds.num_nodes,
        num_classes=ds.num_classes,
        num_rels=ds.num_rels,
        feature_dim=cfg.feature_dim,
        init_fea_dim=cfg.init_fea_dim,
        num_base_r=cfg.num_base_r,
        dropout=cfg.dropout,
        op_norm=cfg.op_norm,
    )
    layers = len(genotypes)

    def make_blocks(seeds, raw: bool = False):
        blocks, sp = build_blocks(csr, seeds, layers)
        if mesh is not None and not raw:
            from mr_gnas_tpu.dist.spmd import build_local_blocks, shard_local_tree

            blocks = shard_local_tree(
                build_local_blocks(blocks, data_n), mesh
            )
        return blocks, sp

    seeds0 = ds.target_ids[ds.train_idx[: cfg.batch_size]]
    # init on plain (unsharded) blocks: param shapes are identical
    blocks0, _ = make_blocks(seeds0, raw=True)
    variables = model.init(key, blocks0, False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    if mesh is not None:
        params, bstats = replicate((params, bstats), mesh)
    log.info("param size = %.3fMB", count_parameters(params) * 4 / 1e6)

    if cfg.optimizer.lower() == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
            optax.sgd(cfg.learning_rate, momentum=cfg.momentum),
        )
    else:
        tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)

    start_epoch = 0
    if cfg.checkpoint:
        state, meta = load_checkpoint(
            cfg.checkpoint,
            {"params": params, "batch_stats": bstats, "opt_state": opt_state},
        )
        params, bstats = state["params"], state["batch_stats"]
        opt_state = state["opt_state"]
        start_epoch = (meta or {}).get("epoch", -1) + 1
        log.info("resuming at epoch %s from %s", start_epoch, cfg.checkpoint)

    def _local_loss(params, bstats, _alphas, blocks, seed_pos, labels, mask, dkey):
        logits, mut = model.apply(
            {"params": params, "batch_stats": bstats}, blocks, True,
            mutable=["batch_stats"], rngs={"dropout": dkey},
        )
        return nc_loss(logits[seed_pos], labels, mask), mut["batch_stats"]

    if mesh is None:
        def loss_of(params, bstats, blocks, seed_pos, labels, mask, dkey):
            return _local_loss(params, bstats, None, blocks, seed_pos, labels, mask, dkey)
    else:
        from mr_gnas_tpu.dist.spmd import make_spmd_loss_nc

        _spmd = make_spmd_loss_nc(mesh, _local_loss)

        def loss_of(params, bstats, blocks, seed_pos, labels, mask, dkey):
            return _spmd(params, bstats, None, blocks, seed_pos, labels, mask, dkey)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, bstats, opt_state, blocks, seed_pos, labels, mask, dkey):
        def loss_fn(p):
            return loss_of(p, bstats, blocks, seed_pos, labels, mask, dkey)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    def _apply_logits(params, bstats, blocks):
        return model.apply({"params": params, "batch_stats": bstats}, blocks, False)

    if mesh is None:
        eval_logits = jax.jit(_apply_logits)
    else:
        from jax.sharding import PartitionSpec as P

        from mr_gnas_tpu.dist.spmd import local_view

        @jax.jit
        def eval_logits(params, bstats, blocks):
            bspec = jax.tree.map(lambda _: P("data"), blocks)

            def f(params, bstats, bstack):
                out = _apply_logits(params, bstats, local_view(bstack))
                # all-gathered logits are identical on every device;
                # pmean makes that provable to the vma check
                return jax.lax.pmean(out, "data")

            return jax.shard_map(
                f, mesh=mesh, in_specs=(P(), P(), bspec), out_specs=P()
            )(params, bstats, blocks)

    def evaluate(idx):
        """(micro accuracy, macro accuracy over classes)."""
        correct = np.zeros(ds.num_classes)
        count = np.zeros(ds.num_classes)
        for idx_b, mask in iterate_seed_batches(idx, cfg.batch_size, shuffle=False):
            seeds = ds.target_ids[idx_b]
            blocks, sp = make_blocks(seeds)
            logits = np.asarray(eval_logits(params, bstats, blocks))
            pred = logits[sp].argmax(-1)
            labels = ds.labels[idx_b]
            for p, y, m in zip(pred, labels, mask):
                if m > 0:
                    count[y] += 1
                    correct[y] += int(p == y)
        micro = correct.sum() / max(count.sum(), 1)
        present = count > 0
        macro = (correct[present] / count[present]).mean() if present.any() else 0.0
        return float(micro), float(macro)

    best = {"test_acc": 0.0, "epoch": -1}
    thr = Throughput()
    epochs = max_epochs or cfg.epochs
    for epoch in range(start_epoch, epochs):
        # per-epoch derived RNG -> bit-exact resume
        rng = np.random.default_rng([cfg.seed, epoch])
        key = jax.random.fold_in(jax.random.key(cfg.seed), epoch)
        losses = []
        for step, (idx_b, mask) in enumerate(
            iterate_seed_batches(ds.train_idx, cfg.batch_size, True, rng)
        ):
            seeds = ds.target_ids[idx_b]
            blocks, sp = make_blocks(seeds)
            dkey = jax.random.fold_in(key, step)
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, blocks, jnp.asarray(sp),
                jnp.asarray(ds.labels[idx_b]), jnp.asarray(mask), dkey,
            )
            losses.append(loss)  # device scalar; fetched once per epoch
            thr.step(sum(b.n_edges for b in blocks))
        # ONE fetch per epoch (a per-step float(loss) would sync the
        # dispatch pipeline every step)
        losses = [float(x) for x in np.asarray(jnp.stack(losses))] if losses else []

        if cfg.finite_check_every and epoch % cfg.finite_check_every == 0:
            from mr_gnas_tpu.train.metrics import guard_finite

            guard_finite(np.sum(losses), epoch, log)

        if epoch % cfg.log_every == 0 or epoch == epochs - 1:
            micro, macro = evaluate(ds.test_idx)
            tr_micro, _ = evaluate(ds.train_idx)
            log.info(
                "Epoch %04d | Loss %.4f | train %.4f | test micro %.4f macro %.4f | %.0f edges/s",
                epoch, float(np.mean(losses)), tr_micro, micro, macro, thr.edges_per_sec,
            )
            scalars.log(
                epoch, train_loss=float(np.mean(losses)), train_acc=tr_micro,
                test_acc=micro, test_macro=macro, edges_per_sec=thr.edges_per_sec,
            )
            if micro > best["test_acc"]:
                best.update(test_acc=micro, epoch=epoch)
                save_checkpoint(
                    os.path.join(run_dir, "model_best.msgpack"),
                    {"params": params, "batch_stats": bstats, "opt_state": opt_state},
                    {"epoch": epoch, "test_acc": micro},
                )

    log.info("Best test acc %.4f @ epoch %d", best["test_acc"], best["epoch"])
    scalars.close()
    return {"best": best, "run_dir": run_dir, "edges_per_sec": thr.edges_per_sec}
