"""Worker process for tests/test_multihost.py: one SPMD train step on a
2-process x 2-virtual-device CPU cluster. Prints one JSON line with the
loss, a digest of the post-step replicated params, and a digest of this
process's local edge shards."""
from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    from mr_gnas_tpu.dist.multihost import initialize

    import jax

    jax.config.update("jax_platforms", "cpu")
    initialize(
        f"localhost:{port}", num_processes=2, process_id=pid,
        cpu_collectives="gloo", local_device_count=2,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    import jax.numpy as jnp
    import numpy as np
    import optax

    from mr_gnas_tpu.cells import CellSpec, init_alphas
    from mr_gnas_tpu.data import (
        generate_sampled_graph_and_labels,
        get_adj_and_degrees,
        synthetic_kg,
    )
    from mr_gnas_tpu.dist import build_local_batch, make_mesh, make_spmd_loss, replicate
    from mr_gnas_tpu.models import LPSupernet
    from mr_gnas_tpu.models.lp import lp_search_loss_grouped

    # identical seeds on every host -> identical host-side batch; each
    # process materializes only its devices' shards (global_put)
    kg = synthetic_kg(num_ent=64, num_rels=4, n_train=300)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    batch = generate_sampled_graph_and_labels(
        kg.train, 32, 0.5, kg.num_rels, adj, deg, 4, "uniform",
        np.random.default_rng(0), n_nodes_pad=64, n_fwd_pad=16, grouped=True,
    )
    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent, num_rels=kg.num_rels, layers=1, spec=spec,
        feature_dim=16, init_fea_dim=8, num_base_r=4,
        dropout_cell=0.0, drop_aggr=0.0,
    )
    alphas = init_alphas(jax.random.key(0), spec, 1, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)

    mesh = make_mesh((4,), ("data",), devices=np.asarray(jax.devices()))
    lb = build_local_batch(batch, mesh)

    def local_loss_fn(p, bs, a, graph, t, l, dkey, training=True):
        (e, r), mut = model.apply(
            {"params": p, "batch_stats": bs}, graph, a, training,
            mutable=["batch_stats"], rngs={"dropout": dkey},
        )
        nh, nt = l
        return lp_search_loss_grouped(e, r, t, nh, nt), mut["batch_stats"]

    loss_fn = make_spmd_loss(mesh, local_loss_fn)
    params, bstats, a_rep = replicate(
        (variables["params"], variables["batch_stats"], alphas), mesh
    )
    tx = optax.sgd(1e-2, momentum=0.9)
    opt = tx.init(params)

    @jax.jit
    def step(params, bstats, opt, a_rep, graph, trip, negs):
        # NB: global (cross-process) arrays must be jit ARGUMENTS, not
        # closure captures
        def wloss(p):
            return loss_fn(
                p, bstats, a_rep, graph, trip, negs, jax.random.key(2), True
            )

        (loss, nb), grads = jax.value_and_grad(wloss, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), nb, opt, loss

    params, bstats, opt, loss = step(
        params, bstats, opt, a_rep, lb.graph, lb.triplets,
        (lb.neg_heads, lb.neg_tails),
    )

    def digest(tree):
        h = hashlib.sha256()
        for leaf in jax.tree.leaves(tree):
            h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
        return h.hexdigest()

    # this process's local edge shards (src rows of its devices)
    shard_bytes = hashlib.sha256()
    for s in lb.graph.src.addressable_shards:
        shard_bytes.update(np.ascontiguousarray(np.asarray(s.data)).tobytes())
    print(
        json.dumps(
            {
                "pid": pid,
                "loss": float(loss),
                "params_digest": digest(params),
                "bstats_digest": digest(bstats),
                "shard_digest": shard_bytes.hexdigest(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
