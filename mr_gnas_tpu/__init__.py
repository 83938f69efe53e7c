"""MR-GNAS-TPU: a TPU-native multi-relational graph NAS framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Amanda-Zheng/MR-GNAS (ICDM'22): DARTS-style differentiable architecture
search over multi-relational GNN message-passing cells, with node
classification (NC) and link prediction (LP) task stacks.

Layering (bottom-up):
  graph/    static-shape multi-relational graph containers + host builders
  kernels/  relation-typed sparse primitives (jnp baselines + Pallas)
  ops/      the operation search space as flax modules
  cells/    supernet & compiled-genotype cells; genotype schema
  models/   NC / LP networks (supernet + fixed-genotype)
  nas/      bi-level architect (1st- and 2nd-order DARTS)
  data/     dataset loaders, samplers, negative sampling, 1-vs-N labels
  dist/     device-mesh sharding: edge-partitioned aggregation, sharded scoring
  train/    drivers, config, eval, checkpointing, metrics
"""

__version__ = "0.1.0"
