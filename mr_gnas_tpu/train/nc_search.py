"""NC bi-level supernet search driver (search/mr_nc_search.py analog).

Per-step: draw a train seed minibatch and a fresh val minibatch
(search/mr_nc_search.py:164-171), run the architect's alpha update on the
val batch, then SGD on the train batch; genotype-stability early stop
(:134-146); val/test accuracy per epoch.
"""
from __future__ import annotations

import functools

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mr_gnas_tpu.cells import CellSpec, decode_genotypes, genotypes_to_json, init_alphas
from mr_gnas_tpu.data import CSRGraph, build_blocks, iterate_seed_batches, load_nc_dataset
from mr_gnas_tpu.models import NCSupernet, nc_accuracy, nc_loss
from mr_gnas_tpu.nas import make_arch_optimizer, sgd_momentum_buffer, unrolled_step
from mr_gnas_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from mr_gnas_tpu.train.config import NCSearchConfig
from mr_gnas_tpu.train.metrics import (
    ScalarLogger,
    Throughput,
    count_parameters,
    setup_logging,
    setup_run_dir,
)


def run_nc_search(cfg: NCSearchConfig, max_steps: int | None = None) -> dict:
    run_dir = setup_run_dir(cfg.save_dir, f"nc-search-{cfg.dataset}")
    log = setup_logging(run_dir)
    scalars = ScalarLogger(run_dir)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    key = jax.random.key(cfg.seed)

    # distribution: manual-SPMD block partitioning (dist/spmd.py) —
    # each device owns a contiguous slice of every block's edge rows
    # plus a dst-node block; cells merge aggregation partials and psum
    # BN statistics; one all-gather per layer
    mesh = None
    data_n = 1
    if cfg.mesh_shape:
        from mr_gnas_tpu.dist import make_mesh, replicate

        mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
        data_n = mesh.shape.get("data", 1)
        log.info("mesh: %s (manual-SPMD block partitioning)", dict(mesh.shape))

    ds = load_nc_dataset(cfg.dataset, cfg.data_root)
    csr = CSRGraph(ds.src, ds.dst, ds.etype, ds.num_nodes)
    train_idx, val_idx = ds.search_split()

    spec = CellSpec(
        task="nc",
        zero_nodes=cfg.zero_nodes,
        first_nodes=cfg.first_nodes,
        last_nodes=cfg.last_nodes,
    )
    model = NCSupernet(
        num_nodes=ds.num_nodes,
        num_classes=ds.num_classes,
        num_rels=ds.num_rels,
        layers=cfg.layers,
        spec=spec,
        feature_dim=cfg.feature_dim,
        init_fea_dim=cfg.init_fea_dim,
        num_base_r=cfg.num_base_r,
        dropout=cfg.dropout,
    )
    alphas = init_alphas(key, spec, cfg.layers)

    def make_blocks(seeds, raw: bool = False):
        blocks, sp = build_blocks(csr, seeds, cfg.layers)
        if mesh is not None and not raw:
            from mr_gnas_tpu.dist.spmd import build_local_blocks, shard_local_tree

            blocks = shard_local_tree(build_local_blocks(blocks, data_n), mesh)
        return blocks, sp

    seeds0 = ds.target_ids[train_idx[: cfg.batch_size]]
    # init on plain (unsharded) blocks: param shapes are identical
    blocks0, _ = make_blocks(seeds0, raw=True)
    variables = model.init(jax.random.key(cfg.seed + 1), blocks0, alphas, False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    if mesh is not None:
        params, bstats, alphas = replicate((params, bstats, alphas), mesh)
    log.info("param size = %.3fMB", count_parameters(params) * 4 / 1e6)

    w_tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
        optax.sgd(cfg.learning_rate, momentum=cfg.momentum),
    )
    w_opt = w_tx.init(params)
    a_tx = make_arch_optimizer(cfg.arch_learning_rate, cfg.arch_weight_decay)
    a_opt = a_tx.init(alphas)

    start_epoch = 0
    if cfg.checkpoint:
        state, meta = load_checkpoint(
            cfg.checkpoint,
            {"params": params, "batch_stats": bstats, "alphas": alphas,
             "w_opt": w_opt, "a_opt": a_opt},
        )
        params, bstats, alphas = state["params"], state["batch_stats"], state["alphas"]
        w_opt, a_opt = state["w_opt"], state["a_opt"]
        start_epoch = (meta or {}).get("epoch", -1) + 1
        log.info("resuming search at epoch %s from %s", start_epoch, cfg.checkpoint)

    def _local_loss(params, bstats, alphas, blocks, seed_pos, labels, mask, dkey):
        logits, mut = model.apply(
            {"params": params, "batch_stats": bstats},
            blocks, alphas, True,
            mutable=["batch_stats"], rngs={"dropout": dkey},
        )
        return nc_loss(logits[seed_pos], labels, mask), mut["batch_stats"]

    if mesh is None:
        loss_of = _local_loss
    else:
        from mr_gnas_tpu.dist.spmd import make_spmd_loss_nc

        loss_of = make_spmd_loss_nc(mesh, _local_loss)

    @jax.jit
    def arch_step_first(params, bstats, alphas, a_opt, blocks, seed_pos, labels, mask, dkey):
        # the val forward advances BN running stats, as the torch modules
        # do during the reference's architect backward (architect.py:44-46)
        def vloss(a):
            return loss_of(params, bstats, a, blocks, seed_pos, labels, mask, dkey)

        (loss, new_bs), grads = jax.value_and_grad(vloss, has_aux=True)(alphas)
        updates, a_opt = a_tx.update(grads, a_opt, alphas)
        return optax.apply_updates(alphas, updates), a_opt, new_bs, loss

    @jax.jit
    def arch_step_unrolled(
        params, bstats, alphas, a_opt,
        blocks_t, sp_t, lab_t, m_t,
        blocks_v, sp_v, lab_v, m_v, dkey, mom_buf,
    ):
        def tloss(p, a):
            l, _ = loss_of(p, bstats, a, blocks_t, sp_t, lab_t, m_t, dkey)
            return l

        def vloss(p, a):
            l, _ = loss_of(p, bstats, a, blocks_v, sp_v, lab_v, m_v, dkey)
            return l

        return unrolled_step(
            a_tx, a_opt, alphas, params, tloss, vloss,
            eta=cfg.learning_rate,
            network_momentum=cfg.momentum,
            network_weight_decay=cfg.weight_decay,
            momentum_buf=mom_buf,
            mode=cfg.hvp_mode,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def weight_step(params, bstats, w_opt, alphas, blocks, seed_pos, labels, mask, dkey):
        def wloss(p):
            return loss_of(p, bstats, alphas, blocks, seed_pos, labels, mask, dkey)

        (loss, new_bs), grads = jax.value_and_grad(wloss, has_aux=True)(params)
        updates, w_opt = w_tx.update(grads, w_opt, params)
        return optax.apply_updates(params, updates), new_bs, w_opt, loss

    def _apply_logits(params, bstats, alphas, blocks):
        return model.apply(
            {"params": params, "batch_stats": bstats}, blocks, alphas, False
        )

    if mesh is None:
        eval_logits = jax.jit(_apply_logits)
    else:
        from jax.sharding import PartitionSpec as P

        from mr_gnas_tpu.dist.spmd import local_view

        @jax.jit
        def eval_logits(params, bstats, alphas, blocks):
            bspec = jax.tree.map(lambda _: P("data"), blocks)

            def f(params, bstats, alphas, bstack):
                out = _apply_logits(params, bstats, alphas, local_view(bstack))
                # all-gathered logits are identical on every device;
                # pmean makes that provable to the vma check
                return jax.lax.pmean(out, "data")

            return jax.shard_map(
                f, mesh=mesh, in_specs=(P(), P(), P(), bspec), out_specs=P()
            )(params, bstats, alphas, blocks)

    def batch_inputs(idx_batch, mask):
        seeds = ds.target_ids[idx_batch]
        blocks, seed_pos = make_blocks(seeds)
        labels = jnp.asarray(ds.labels[idx_batch])
        return blocks, jnp.asarray(seed_pos), labels, jnp.asarray(mask)

    def evaluate(idx):
        accs, total = 0.0, 0
        for idx_b, mask in iterate_seed_batches(idx, cfg.batch_size, shuffle=False):
            blocks, sp, labels, m = batch_inputs(idx_b, mask)
            logits = eval_logits(params, bstats, alphas, blocks)
            acc = nc_accuracy(logits[sp], labels, m)
            n = int(mask.sum())
            accs += float(acc) * n
            total += n
        return accs / max(total, 1)

    from mr_gnas_tpu.train.metrics import PackedFetch

    fetch_alphas = PackedFetch(alphas)  # one RPC round trip per epoch
    best_geno = genotypes_to_json(decode_genotypes(fetch_alphas(alphas), spec, cfg.layers))
    patience = 0
    thr = Throughput()
    steps_total = 0
    n_epochs = max_steps or cfg.epochs
    arch_loss = jnp.zeros(())
    for epoch in range(start_epoch, n_epochs):
        # per-epoch derived RNG -> bit-exact resume
        rng = np.random.default_rng([cfg.seed, epoch])
        key = jax.random.fold_in(jax.random.key(cfg.seed), epoch)
        for idx_b, mask in iterate_seed_batches(train_idx, cfg.batch_size, True, rng):
            blocks, sp, labels, m = batch_inputs(idx_b, mask)
            # fresh val batch per step (search/mr_nc_search.py:167)
            v_idx = rng.choice(val_idx, size=min(cfg.batch_size, len(val_idx)), replace=False)
            v_mask = np.ones(len(v_idx), np.float32)
            blocks_v, sp_v, labels_v, m_v = batch_inputs(v_idx, v_mask)
            key, k1, k2 = jax.random.split(key, 3)

            if epoch >= cfg.warm_epochs:
                if cfg.unrolled:
                    alphas, a_opt, arch_loss = arch_step_unrolled(
                        params, bstats, alphas, a_opt,
                        blocks, sp, labels, m,
                        blocks_v, sp_v, labels_v, m_v,
                        k1, sgd_momentum_buffer(w_opt),
                    )
                else:
                    alphas, a_opt, bstats, arch_loss = arch_step_first(
                        params, bstats, alphas, a_opt, blocks_v, sp_v, labels_v, m_v, k1
                    )
            params, bstats, w_opt, loss = weight_step(
                params, bstats, w_opt, alphas, blocks, sp, labels, m, k2
            )
            thr.step(sum(b.n_edges for b in blocks))
            steps_total += 1

        if cfg.finite_check_every and epoch % cfg.finite_check_every == 0:
            from mr_gnas_tpu.train.metrics import guard_finite

            guard_finite(loss, epoch, log)

        if epoch % cfg.log_every == 0:
            val_acc = evaluate(val_idx)
            test_acc = evaluate(ds.test_idx)
            log.info(
                "Epoch %04d | Loss %.4f | Arch %.4f | val %.4f | test %.4f | %.0f edges/s",
                epoch, float(loss), float(arch_loss), val_acc, test_acc, thr.edges_per_sec,
            )
            scalars.log(
                epoch, train_loss=float(loss), arch_loss=float(arch_loss),
                val_acc=val_acc, test_acc=test_acc, edges_per_sec=thr.edges_per_sec,
            )

        if epoch >= cfg.warm_epochs:
            genotypes = genotypes_to_json(
                decode_genotypes(fetch_alphas(alphas), spec, cfg.layers)
            )
            if genotypes == best_geno:
                patience += 1
            else:
                patience = 0
                best_geno = genotypes
            if patience >= cfg.max_patience:
                log.info("Reached max patience; best genotype %s", best_geno)
                break

    genotypes = decode_genotypes(fetch_alphas(alphas), spec, cfg.layers)
    save_checkpoint(
        os.path.join(run_dir, "search_state.msgpack"),
        {"params": params, "batch_stats": bstats, "alphas": alphas,
         "w_opt": w_opt, "a_opt": a_opt},
        {"epoch": n_epochs - 1, "genotypes": genotypes_to_json(genotypes)},
    )
    with open(os.path.join(run_dir, "genotypes.json"), "w") as f:
        f.write(genotypes_to_json(genotypes))
    log.info("Done. Genotypes: %s", [g.to_reference_str() for g in genotypes])
    scalars.close()
    return {
        "genotypes": genotypes,
        "run_dir": run_dir,
        "last_loss": float(loss),
        "edges_per_sec": thr.edges_per_sec,
    }
