"""Serving: checkpointed LP models as a query-scoring service.

The reference has no inference path beyond its eval loop; production
deployment needs one. :class:`Predictor` loads a retrained checkpoint,
precomputes the entity/relation embeddings once (the GNN encode is
query-independent — the expensive part of the reference's per-batch
forward, train/mr_lp_train.py:230, is hoisted out entirely), and serves
jitted 1-vs-N scoring / top-k retrieval. With a mesh whose ``model``
axis is >1, the precomputed entity table is laid out row-sharded over
that axis (``jax.sharding.NamedSharding``), so the 1-vs-N score matmul
partitions by entity columns across devices (the TP analog, SURVEY
§2.9 — the reference's [B, num_ent] matmul at model_lp.py:135) and the
full table is never replicated; GSPMD inserts the gather for the [B]
subject-row lookups.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mr_gnas_tpu.cells.genotype import Genotype
from mr_gnas_tpu.data import load_dataset
from mr_gnas_tpu.graph import build_rel_graph
from mr_gnas_tpu.models import LPNetwork
from mr_gnas_tpu.train.checkpoint import load_checkpoint
from mr_gnas_tpu.train.config import LPTrainConfig
from mr_gnas_tpu.train.lp_train import parse_genotypes


class Predictor:
    """Precomputed-embedding LP scorer.

    Build with :meth:`from_checkpoint` (driver artifacts) or directly
    from (model, variables, graph).
    """

    def __init__(self, model: LPNetwork, variables: dict, graph, mesh=None):
        self.model = model
        ent, rel = model.apply(
            variables, graph, False, method=LPNetwork.encode
        )
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            if ent.shape[0] % mesh.shape["model"]:
                raise ValueError(
                    f"entity table rows {ent.shape[0]} must divide the "
                    f"model axis {mesh.shape['model']} — rebuild the "
                    "graph with pad_multiple=model_n"
                )
            # TP analog: entity rows sharded; every downstream score
            # matmul against ent_emb.T partitions by output column
            ent = jax.device_put(ent, NamedSharding(mesh, P("model", None)))
            rel = jax.device_put(rel, NamedSharding(mesh, P()))
        mask = jnp.asarray(graph.node_mask)
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            mask = jax.device_put(mask, NamedSharding(mesh, P("model")))
        self.node_mask = mask  # padded entity columns never rank
        self.ent_emb = ent
        self.rel_emb = rel
        self.variables = variables
        self._score = jax.jit(self._score_impl)

    def _score_impl(self, subj, rel):
        sub_emb = jnp.take(self.ent_emb, subj, axis=0)
        rel_e = jnp.take(self.rel_emb, rel, axis=0)
        # score_fn is logits-native (models/lp.py); serving keeps the
        # probability contract
        logits = self.model.apply(
            self.variables,
            self.ent_emb,
            sub_emb,
            rel_e,
            False,
            method=lambda m, a, s, r, t: m.score_fn(a, s, r, t),
        )
        logits = jnp.where(self.node_mask[None, :] > 0, logits, -1e30)
        return jax.nn.sigmoid(logits)

    def scores(self, subj, rel) -> jax.Array:
        """[B, num_ent] probabilities for (subj, rel) queries."""
        return self._score(jnp.asarray(subj), jnp.asarray(rel))

    def topk(self, subj, rel, k: int = 10):
        """(scores [B, k], entity ids [B, k]) best completions."""
        s = self.scores(subj, rel)
        vals, idx = jax.lax.top_k(s, k)
        return np.asarray(vals), np.asarray(idx)

    @classmethod
    def from_checkpoint(
        cls, checkpoint_path: str, cfg: LPTrainConfig,
        genotypes: list[Genotype] | None = None, mesh=None,
    ) -> "Predictor":
        kg = load_dataset(cfg.dataset, cfg.data_root)
        graph = build_rel_graph(
            kg.train, kg.num_ent, kg.num_rels,
            pad_multiple=mesh.shape.get("model", 1) if mesh is not None else 1,
        )
        genos = genotypes or parse_genotypes(cfg.genotype)
        model = LPNetwork(
            genotypes=tuple(genos),
            num_ent=kg.num_ent,
            num_rels=kg.num_rels,
            feature_dim=cfg.feature_dim,
            init_fea_dim=cfg.init_fea_dim,
            num_base_r=cfg.num_base_r,
            dropout_cell=cfg.dropout_cell,
            drop_aggr=cfg.drop_aggr,
            score_args=cfg.score_args(),
        )
        z = jnp.zeros((1,), jnp.int32)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0), graph, z, z, False)
        )
        like = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        state, _ = load_checkpoint(checkpoint_path, like)
        return cls(
            model,
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            graph,
            mesh=mesh,
        )
