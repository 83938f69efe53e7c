"""Compiled-on-TPU check for the manual-SPMD path (dist/spmd.py).

Runs the shard_map'd LP-supernet train step on a 1-device TPU mesh with
the per-shard blocked-CSR Pallas kernels attached, and compares loss +
grads against the plain single-device program compiled IN THE SAME
SESSION (same compiler, same flags) — the same-compile parity contract
of VERDICT r2 item 9. A 1-device mesh makes every collective a no-op,
so any disagreement isolates the shard_map/Mosaic integration (vma
transpose through the custom-VJP kernels), not merge math — the merge
math is covered by tests/test_spmd.py on the virtual CPU mesh.

Usage: python scripts/spmd_tpu_check.py  (needs the TPU; ~1-2 min cold)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    den = np.linalg.norm(b) + 1e-30
    return float(np.linalg.norm(a - b) / den)


def main():
    assert jax.default_backend() == "tpu", "this check needs the real TPU"

    from mr_gnas_tpu.cells import CellSpec, init_alphas
    from mr_gnas_tpu.data import (
        generate_sampled_graph_and_labels,
        get_adj_and_degrees,
        synthetic_kg,
    )
    from mr_gnas_tpu.dist import build_local_batch, make_mesh, make_spmd_loss
    from mr_gnas_tpu.graph.build import attach_csr
    from mr_gnas_tpu.models import LPSupernet
    from mr_gnas_tpu.models.lp import lp_search_loss_grouped

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--megakernel", action="store_true",
        help="also check the BN-mix megakernel path under the mesh "
        "(bn_mix axis psums) against the plain megakernel step",
    )
    cli = ap.parse_args()

    kg = synthetic_kg(num_ent=512, num_rels=16, n_train=4096, seed=0)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    batch = generate_sampled_graph_and_labels(
        kg.train, 1024, 0.5, kg.num_rels, adj, deg, 4, "uniform",
        np.random.default_rng(0), n_nodes_pad=1024, grouped=True,
    )
    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent, num_rels=kg.num_rels, layers=2, spec=spec,
        feature_dim=128, init_fea_dim=64, num_base_r=16,
        dropout_cell=0.0, drop_aggr=0.0, megakernel=cli.megakernel,
    )
    alphas = init_alphas(jax.random.key(0), spec, 2, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)
    params, bstats = variables["params"], variables["batch_stats"]
    key = jax.random.key(7)

    def local_loss_fn(p, bs, a, graph, t, l, dkey, training=True):
        (e, r), mut = model.apply(
            {"params": p, "batch_stats": bs}, graph, a, training,
            mutable=["batch_stats"], rngs={"dropout": dkey},
        )
        nh, nt = l
        return lp_search_loss_grouped(e, r, t, nh, nt), mut["batch_stats"]

    # plain single-device step, Pallas CSR attached
    import dataclasses

    g_csr = attach_csr(batch.graph, static_pad=True)
    trip = jnp.asarray(batch.triplets)
    lab = (jnp.asarray(batch.neg_heads), jnp.asarray(batch.neg_tails))

    def lf1(p, a):
        return local_loss_fn(p, bstats, a, g_csr, trip, lab, key, True)

    (l1, bs1), g1 = jax.jit(
        jax.value_and_grad(lf1, argnums=(0, 1), has_aux=True)
    )(params, alphas)

    # spmd step on a 1-device mesh, per-shard Pallas CSR
    mesh = make_mesh((1,), ("data",))
    lb = build_local_batch(batch, mesh, pallas_csr=True)
    sl = make_spmd_loss(mesh, local_loss_fn)

    def lf_spmd(p, a):
        return sl(
            p, bstats, a, lb.graph, lb.triplets,
            (lb.neg_heads, lb.neg_tails), key, True,
        )

    (l2, bs2), g2 = jax.jit(
        jax.value_and_grad(lf_spmd, argnums=(0, 1), has_aux=True)
    )(params, alphas)

    ok = True
    dl = abs(float(l1) - float(l2)) / (abs(float(l1)) + 1e-30)
    print(f"loss: plain={float(l1):.6f} spmd={float(l2):.6f} rel={dl:.2e}")
    ok &= dl < 1e-5
    for name, t1, t2 in (("grads", g1, g2), ("bstats", bs1, bs2)):
        l_1 = jax.tree_util.tree_leaves_with_path(t1)
        l_2 = jax.tree_util.tree_leaves_with_path(t2)
        assert len(l_1) == len(l_2), f"{name}: leaf count mismatch"
        worst = 0.0
        for (k1, v1), (k2, v2) in zip(l_1, l_2):
            assert str(k1) == str(k2), f"{name}: key mismatch {k1} != {k2}"
            # per-shard CSR row perm differs from the full CSR's (the
            # per-shard build re-sorts within the shard) -> same-compile
            # parity is fp-reassociation-tight, not bit-exact
            e = rel_l2(v1, v2)
            worst = max(worst, e)
            if e > 2e-5:
                print(f"  FAIL {name}{jax.tree_util.keystr(k1)}: rel-L2 {e:.2e}")
                ok = False
        print(f"{name}: worst rel-L2 {worst:.2e} over {len(l_1)} leaves")
    print("spmd_tpu_check:", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
