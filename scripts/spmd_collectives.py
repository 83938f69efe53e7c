"""Print the collective-op inventory of the SPMD LP-supernet train step.

Lowers the shard_map'd loss+grad step over an 8-device virtual CPU mesh
and counts the cross-device collectives in the optimized HLO — the
documentation artifact for VERDICT r2 item 1 ("the collective inventory
in the HLO is documented"). Expected per 2-layer supernet step (forward
+ backward):

  * reduce-scatter: middle-stage sum/mean-num/count merges (fwd) and
    the all-gather transposes (bwd)
  * all-to-all: max-partial merges (fwd + transposed bwd)
  * all-gather: one per layer (node-table rebuild, fwd) and the
    reduce-scatter transposes (bwd)
  * all-reduce: BN statistic psums (small [K, D] tensors), the loss
    pmean, and the replicated-param gradient psums inserted by the
    shard_map transpose
"""
from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mr_gnas_tpu.cells import CellSpec, init_alphas
from mr_gnas_tpu.data import (
    generate_sampled_graph_and_labels,
    get_adj_and_degrees,
    synthetic_kg,
)
from mr_gnas_tpu.dist import build_local_batch, make_mesh, make_spmd_loss, replicate
from mr_gnas_tpu.models import LPSupernet
from mr_gnas_tpu.models.lp import lp_search_loss_grouped


def main():
    kg = synthetic_kg(num_ent=256, num_rels=8, n_train=1024, seed=0)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    batch = generate_sampled_graph_and_labels(
        kg.train, 128, 0.5, kg.num_rels, adj, deg, 4, "uniform",
        np.random.default_rng(0), n_nodes_pad=256, grouped=True,
    )
    spec = CellSpec(task="lp")
    model = LPSupernet(
        num_ent=kg.num_ent, num_rels=kg.num_rels, layers=2, spec=spec,
        feature_dim=32, init_fea_dim=16, num_base_r=8,
        dropout_cell=0.0, drop_aggr=0.0,
    )
    alphas = init_alphas(jax.random.key(0), spec, 2, with_final=True)
    variables = model.init(jax.random.key(1), batch.graph, alphas, False)

    def local_loss_fn(p, bs, a, graph, t, l, dkey, training=True):
        (e, r), mut = model.apply(
            {"params": p, "batch_stats": bs}, graph, a, training,
            mutable=["batch_stats"], rngs={"dropout": dkey},
        )
        nh, nt = l
        return lp_search_loss_grouped(e, r, t, nh, nt), mut["batch_stats"]

    mesh = make_mesh((8,), ("data",))
    lb = build_local_batch(batch, mesh)
    loss_fn = make_spmd_loss(mesh, local_loss_fn)
    params, bstats, a_rep = replicate(
        (variables["params"], variables["batch_stats"], alphas), mesh
    )

    def step(params, alphas):
        def wloss(p, a):
            return loss_fn(
                p, bstats, a, lb.graph, lb.triplets,
                (lb.neg_heads, lb.neg_tails), jax.random.key(2), True,
            )

        (loss, nb), grads = jax.value_and_grad(
            wloss, argnums=(0, 1), has_aux=True
        )(params, alphas)
        return loss, grads

    lowered = jax.jit(step).lower(params, a_rep)
    hlo = lowered.compile().as_text()
    counts = collections.Counter()
    sizes = collections.defaultdict(list)
    # matches scalar AND variadic/tuple-typed collectives, sync or async
    # (`x = f32[..] all-reduce(...)`, `y = (f32[..], f32[..])
    # all-reduce-start(...)`)
    pat = re.compile(
        r"= (\([^)]*\)|\S+) (all-reduce|reduce-scatter|all-gather|all-to-all"
        r"|collective-permute)(?:-start)?\("
    )
    for line in hlo.splitlines():
        m = pat.search(line)
        if m:
            counts[m.group(2)] += 1
            sizes[m.group(2)].append(m.group(1))
    print("collective inventory (optimized HLO, 8-dev spmd train step):")
    for k in sorted(counts):
        print(f"  {k:20s} x{counts[k]}")
        for s in sorted(set(sizes[k])):
            print(f"      {s} (x{sizes[k].count(s)})")


if __name__ == "__main__":
    main()
