"""Link-prediction networks: supernet and fixed-genotype retrain model.

Re-designs models/model_search_lp.py:16-314 and models/model_lp.py:77-150
as flax modules over the padded :class:`RelGraph` edge-row layout.

Shared plumbing (both networks):
  * entity embeddings ``embedding_h [num_ent, init_dim]`` projected by
    ``linear_e`` to feature_dim (model_search_lp.py:41-44);
  * relation basis decomposition ``rel_wt [2*num_rels+1, num_base_r] @
    embedding_e [num_base_r, D]`` (model_search_lp.py:59,134);
  * per-layer relation transform ``rel_embed @ w_rel`` with a single
    shared ``w_rel`` (model_search_lp.py:61,150,158);
  * the [fwd | inv | self] row re-gather between layers
    (model_search_lp.py:153: ``cat(ent_emb[src_in], ent_emb)`` == our
    ``ent_emb[graph.src]``).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_gnas_tpu.cells.compiled import CompiledCell
from mr_gnas_tpu.cells.genotype import CellSpec, Genotype
from mr_gnas_tpu.cells.supernet import SupernetCell
from mr_gnas_tpu.cells.genotype import layer_weights
from mr_gnas_tpu.graph.container import RelGraph
from mr_gnas_tpu.kernels.table import take_small_table
from mr_gnas_tpu.layers import MaskedBatchNorm, xavier_relu_param
from mr_gnas_tpu.ops.message_ops import dense
from mr_gnas_tpu.ops.registry import OpArgs, SF_OPS, make_score_fn

normal_init = nn.initializers.normal(stddev=1.0)  # torch nn.Embedding default


class _LPEmbeddings(nn.Module):
    """Entity table + relation basis (model_search_lp.py:41-62)."""

    num_ent: int
    num_rels: int
    init_fea_dim: int
    feature_dim: int
    num_base_r: int

    @nn.compact
    def __call__(self):
        emb_h = self.param(
            "embedding_h", normal_init, (self.num_ent, self.init_fea_dim)
        )
        emb_e = self.param(
            "embedding_e", normal_init, (self.num_base_r, self.feature_dim)
        )
        rel_wt = xavier_relu_param(
            self, "rel_wt", (2 * self.num_rels + 1, self.num_base_r)
        )
        all_ent = dense(self.feature_dim, name="linear_e")(emb_h)
        rel_embed = jnp.dot(rel_wt, emb_e, preferred_element_type=jnp.float32)
        return all_ent, rel_embed


class LPSupernet(nn.Module):
    """The LP weight-sharing supernet (model_search_lp.py:16-163).

    ``__call__(graph, alphas, training)`` returns
    ``(ent_emb [n_nodes, D], rel_embed [2*num_rels+1, D])``; alphas is the
    dict produced by :func:`mr_gnas_tpu.cells.init_alphas`.
    """

    num_ent: int
    num_rels: int
    layers: int
    spec: CellSpec
    feature_dim: int
    init_fea_dim: int
    num_base_r: int
    dropout_cell: float = 0.3
    drop_aggr: float = 0.1
    fused: bool = True  # fused einsum cells (see cells/fused.py); the
    # naive per-module path is kept for parity testing and NC
    compute_dtype: object = jnp.float32  # bf16 for the fused cell stacks
    megakernel: bool = False  # training stages via the Pallas BN-mix
    # mega-kernel (kernels/bn_mix.py)
    remat: bool = False  # rematerialize cell activations in backward
    # (trades ~1 extra forward for not holding the op stacks across the
    # whole backward — the jax.checkpoint lever for large graphs)

    @nn.compact
    def __call__(self, graph: RelGraph, alphas: dict, training: bool = False):
        # sharded-local graphs (dist/spmd.py): the fused cell merges its
        # middle-stage partials across `axis` and returns this device's
        # node slice; BN statistics are psum'd; ONE all-gather per layer
        # rebuilds the replicated node table for the next layer's src
        # re-gather (SURVEY §2.9 edge-partitioned aggregation)
        axis = graph.spmd_axis
        if axis is not None and not self.fused:
            raise ValueError("spmd sharded graphs require fused=True cells")
        all_ent, rel_embed = _LPEmbeddings(
            self.num_ent,
            self.num_rels,
            self.init_fea_dim,
            self.feature_dim,
            self.num_base_r,
            name="emb",
        )()
        w_rel = xavier_relu_param(self, "w_rel", (self.feature_dim, self.feature_dim))
        # single shared BN (model_search_lp.py:74); stats psum'd under spmd
        bn = MaskedBatchNorm(name="bn_h", axis_name=axis)
        drop = nn.Dropout(self.dropout_cell, deterministic=not training)

        def gather_src(table):
            """Row re-gather table[graph.src] (model_search_lp.py:153);
            MXU one-hot backward when the graph carries a src CSR."""
            if graph.src_csr is not None:
                from mr_gnas_tpu.kernels.pallas_segment import take_rows_csr

                return take_rows_csr(table, graph.src, graph.src_csr)
            # mode="clip": indices are in-bounds by the RelGraph contract,
            # and the default fill mode adds a [R, D] select pass to every
            # gather (and its backward) — measurable on the profiled step
            return jnp.take(table, graph.src, axis=0, mode="clip")

        ent_emb = None
        for i in range(self.layers):
            w = layer_weights(alphas, self.spec, i)
            if i == 0:
                if axis is not None:
                    # local rows carry precomputed global entity ids
                    ent_in = jnp.take(all_ent, graph.src_gid, axis=0, mode="clip")
                elif graph.src_csr is not None:
                    # two-hop: local-node rows first, so the big [R]-row
                    # gather backprops through the CSR kernel and only the
                    # small [n_nodes]-row hop scatters into the table
                    ent_in = gather_src(
                        jnp.take(all_ent, graph.global_ids, axis=0, mode="clip")
                    )
                else:
                    ent_in = jnp.take(
                        all_ent,
                        jnp.take(graph.global_ids, graph.src, axis=0, mode="clip"),
                        axis=0,
                        mode="clip",
                    )
            else:
                ent_in = gather_src(ent_emb)
            hr = take_small_table(rel_embed, graph.etype)
            if self.fused:
                from mr_gnas_tpu.cells.fused import FusedSupernetCellLP

                cell_cls = (
                    nn.remat(FusedSupernetCellLP, static_argnums=(5,))
                    if self.remat
                    else FusedSupernetCellLP
                )
                cell = cell_cls(
                    spec=self.spec,
                    feature_dim=self.feature_dim,
                    drop_aggr=self.drop_aggr,
                    compute_dtype=self.compute_dtype,
                    megakernel=self.megakernel,
                    name=f"cell_{i}",
                )
            else:
                cell = SupernetCell(
                    spec=self.spec,
                    feature_dim=self.feature_dim,
                    drop_aggr=self.drop_aggr,
                    name=f"cell_{i}",
                )
            ent_emb = cell(graph, ent_in, hr, w, training)
            ent_emb = bn(ent_emb, graph.node_mask, training)
            # ReLU skip rule of model_search_lp.py:146-148: layer 0 of a
            # multi-layer stack gets no ReLU; single-layer stacks do.
            if i > 0 or self.layers == 1:
                ent_emb = jax.nn.relu(ent_emb)
            ent_emb = drop(ent_emb)
            if axis is not None:
                # [N_loc, D] node slice -> replicated-content [N_glob, D]
                # — the only full-table collective of the layer
                from mr_gnas_tpu.dist.spmd import all_gather_nodes

                ent_emb = all_gather_nodes(ent_emb, axis)
            rel_embed = jnp.dot(rel_embed, w_rel, preferred_element_type=jnp.float32)
        return ent_emb, rel_embed


class LPNetwork(nn.Module):
    """Fixed-genotype LP retrain network (model_lp.py:77-141).

    ``__call__(graph, subj, rel, training)`` -> [B, num_ent] probabilities
    via the genotype's 1-vs-N decoder.
    """

    genotypes: tuple[Genotype, ...]
    num_ent: int
    num_rels: int
    feature_dim: int
    init_fea_dim: int
    num_base_r: int
    dropout_cell: float = 0.3
    drop_aggr: float = 0.1
    # (the reference's --drop_op is a no-op: the dropout result is
    # discarded at model_lp.py:34 — deliberately not carried over)
    score_args: dict | None = None

    def setup(self):
        self.emb = _LPEmbeddings(
            self.num_ent,
            self.num_rels,
            self.init_fea_dim,
            self.feature_dim,
            self.num_base_r,
            name="emb",
        )
        self.w_rel = xavier_relu_param(
            self, "w_rel", (self.feature_dim, self.feature_dim)
        )
        self.cells = [
            CompiledCell(
                task="lp",
                genotype=geno,
                feature_dim=self.feature_dim,
                drop_aggr=self.drop_aggr,
                name=f"cell_{i}",
            )
            for i, geno in enumerate(self.genotypes)
        ]
        self.drops = [
            nn.Dropout(self.dropout_cell, name=f"drop_{i}")
            for i in range(len(self.genotypes))
        ]
        name = self.genotypes[-1].score_func or "sf_DisMult"
        args = OpArgs(self.score_args or {})
        args.setdefault("embed_dim", self.feature_dim)
        if name == "sf_ConvE":
            ed, kw, kh = args["embed_dim"], args.get("k_w", 10), args.get("k_h", 20)
            if ed != self.feature_dim or kw * kh != ed:
                raise ValueError(
                    f"sf_ConvE needs embed_dim == feature_dim == k_w*k_h; got "
                    f"embed_dim={ed}, feature_dim={self.feature_dim}, "
                    f"k_w*k_h={kw}*{kh}={kw*kh}. Pass matching --embed-dim/"
                    f"--k-w/--k-h (e.g. --embed-dim {self.feature_dim} with "
                    f"k_w*k_h == {self.feature_dim}), or use a sf_DisMult/"
                    f"sf_TransE genotype."
                )
        # built logits-native: __call__ applies the sigmoid on top (same
        # probabilities as the reference's decoders), while the training
        # loss consumes raw logits (bce_logits_loss — the probs form's
        # eps-clip zeroes gradients once a decoder saturates)
        self.score_fn = make_score_fn(name, args, with_sigmoid=False)

    def encode_trace(self, graph: RelGraph, training: bool = False):
        """encode() that also returns the per-layer (ent_emb, rel_embed)
        trace — the parity surface against the reference
        (model_lp.py:130-133's loop states).

        Sharded-local graphs (``graph.spmd_axis``, dist/spmd.py): each
        compiled cell returns this device's node slice; one all-gather
        per layer rebuilds the replicated table for the next layer's
        ``ent_emb[src]`` re-gather and the 1-vs-N decode — the same
        collective structure as the supernet path."""
        axis = graph.spmd_axis
        ent_emb, rel_embed = self.emb()
        trace = []
        for i, cell in enumerate(self.cells):
            if i == 0 and axis is not None:
                idx = graph.src_gid  # per-row global entity ids
            elif i == 0:
                idx = jnp.take(graph.global_ids, graph.src, axis=0, mode="clip")
            else:
                idx = graph.src
            ent_in = jnp.take(ent_emb, idx, axis=0, mode="clip")
            hr = take_small_table(rel_embed, graph.etype)
            ent_emb = cell(graph, ent_in, hr, training)
            ent_emb = self.drops[i](ent_emb, deterministic=not training)
            if axis is not None:
                from mr_gnas_tpu.dist.spmd import all_gather_nodes

                ent_emb = all_gather_nodes(ent_emb, axis)
            rel_embed = jnp.dot(
                rel_embed, self.w_rel, preferred_element_type=jnp.float32
            )
            trace.append((ent_emb, rel_embed))
        return ent_emb, rel_embed, trace

    def encode(self, graph: RelGraph, training: bool = False):
        """Run the cell stack over the full graph -> (ent_emb, rel_embed)."""
        ent_emb, rel_embed, _ = self.encode_trace(graph, training)
        return ent_emb, rel_embed

    def logits(self, graph: RelGraph, subj, rel, training: bool = False):
        """Raw 1-vs-N decoder logits [B, num_ent] (ranking-equivalent to
        the probabilities; the BCE-with-logits training surface)."""
        ent_emb, rel_embed = self.encode(graph, training)
        sub_emb = jnp.take(ent_emb, subj, axis=0, mode="clip")
        rel_emb = take_small_table(rel_embed, rel)
        return self.score_fn(ent_emb, sub_emb, rel_emb, training)

    def __call__(self, graph: RelGraph, subj, rel, training: bool = False):
        return jax.nn.sigmoid(self.logits(graph, subj, rel, training))

    def logits_from(self, ent_emb, rel_embed, subj, rel, training: bool = False):
        """1-vs-N decoder logits from a precomputed encoding.

        The GNN encode is query-independent, so an eval epoch can run
        :meth:`encode` once and score every query batch against the
        cached table — the same hoist ``serve.Predictor`` applies; the
        reference instead re-encodes the full graph for every eval batch
        (train/mr_lp_train.py:289-294). Identical arithmetic to
        :meth:`logits`: gather + score on the already-encoded tables.
        """
        sub_emb = jnp.take(ent_emb, subj, axis=0, mode="clip")
        rel_emb = take_small_table(rel_embed, rel)
        return self.score_fn(ent_emb, sub_emb, rel_emb, training)

    def logits_from_cols(
        self, ent_emb, rel_embed, subj, rel, n_cols: int, col_axis: str,
        training: bool = False,
    ):
        """Column-sharded 1-vs-N decode from a PRECOMPUTED encoding: the
        encode-once hoist (:meth:`logits_from`) composed with the TP-
        analog column sharding (:meth:`logits_cols`) — one full-graph
        encode per eval pass, then each device scores its contiguous
        entity-column block of the cached table. Replaces the
        reference's per-eval-batch full-graph re-encode
        (train/mr_lp_train.py:289-294) on the sharded path."""
        if (self.score_args or {}).get("conve_out_bias"):
            raise ValueError(
                "column-sharded decode requires conve_out_bias=False "
                "(the per-entity bias parameter spans the full table)"
            )
        sub_emb = jnp.take(ent_emb, subj, axis=0, mode="clip")
        rel_emb = take_small_table(rel_embed, rel)
        col_start = jax.lax.axis_index(col_axis) * n_cols
        cols = jax.lax.dynamic_slice_in_dim(ent_emb, col_start, n_cols, axis=0)
        return self.score_fn(cols, sub_emb, rel_emb, training)

    def logits_cols(
        self, graph: RelGraph, subj, rel, n_cols: int, col_axis: str,
        training: bool = False,
    ):
        """Column-sharded 1-vs-N decode (TP analog, SURVEY §2.9): logits
        [B, n_cols] of this device's contiguous entity-column block
        ``[k*n_cols, (k+1)*n_cols)`` where k = its ``col_axis`` index —
        the [B, num_ent] score matmul of the reference
        (model_lp.py:135) with the entity table sharded by rows, so no
        device ever holds the full score matrix. Every score function
        scores against the rows of the table it is handed, so the shard
        is just a dynamic slice of the encoded table. Requires the
        reference-faithful ConvE head (no per-entity output bias: its
        [num_ent] parameter is keyed to the full table)."""
        if (self.score_args or {}).get("conve_out_bias"):
            raise ValueError(
                "column-sharded decode requires conve_out_bias=False "
                "(the per-entity bias parameter spans the full table)"
            )
        ent_emb, rel_embed = self.encode(graph, training)
        sub_emb = jnp.take(ent_emb, subj, axis=0, mode="clip")
        rel_emb = take_small_table(rel_embed, rel)
        col_start = jax.lax.axis_index(col_axis) * n_cols
        cols = jax.lax.dynamic_slice_in_dim(ent_emb, col_start, n_cols, axis=0)
        return self.score_fn(cols, sub_emb, rel_emb, training)


class MixedScoreFn(nn.Module):
    """Softmax-weighted mixture over score functions (models/cell_lp.py:36-50).

    Allocated-but-unused in the reference's search loss
    (model_search_lp.py:160-161); provided here as a first-class module so
    the score stage *can* be searched.
    """

    gamma: float = 40.0

    @nn.compact
    def __call__(self, all_ent, sub_emb, rel_emb, weights, training: bool = False):
        out = None
        for i, name in enumerate(SF_OPS):
            y = make_score_fn(name, OpArgs(gamma=self.gamma))(
                all_ent, sub_emb, rel_emb, training
            )
            y = weights[i] * y
            out = y if out is None else out + y
        return out


# --------------------------------------------------------------------------
# losses / scores (pure functions)
# --------------------------------------------------------------------------


def _gather_sro(ent_emb, rel_embed, triplets, so_csr=None, dtype=None):
    """Gather (s, r, o) rows. Subject and object rows come from ONE take
    of the entity table so the backward pass emits a single scatter-add
    into ent_emb instead of two (triplet batches are B = edges*(1+neg)
    rows — the largest scatter in the search step). When ``so_csr`` (the
    blocked CSR of ``cat(s_ids, o_ids)``, graph/build.index_csr) is
    given, that scatter becomes the one-hot MXU sum.

    ``dtype`` (e.g. bf16) casts the tables BEFORE the gather, halving the
    bytes of the [2B, D] gather, the score products, and — dominant — the
    backward grad scatter-add into the entity table (the single largest
    fusion of the profiled bf16 search step, NOTES.md roofline). Score
    reductions still accumulate in f32; the grad scatter then accumulates
    in ``dtype`` (a documented deviation of the bf16 compute path)."""
    if dtype is not None:
        ent_emb = ent_emb.astype(dtype)
        rel_embed = rel_embed.astype(dtype)
    so_idx = jnp.concatenate([triplets[:, 0], triplets[:, 2]])
    if so_csr is not None:
        from mr_gnas_tpu.kernels.pallas_segment import take_rows_csr

        so = take_rows_csr(ent_emb, so_idx, so_csr)
    else:
        # mode="clip" (in-bounds by construction) skips the fill-select
        so = jnp.take(ent_emb, so_idx, axis=0, mode="clip")
    s, o = jnp.split(so, 2, axis=0)
    r = take_small_table(rel_embed, triplets[:, 1])
    return s, r, o


def distmult_triplet_score(ent_emb, rel_embed, triplets, so_csr=None, dtype=None):
    """sum(s * r * o) per triplet — the hard-coded search-time score
    (model_search_lp.py:169-176). Accumulates in f32."""
    s, r, o = _gather_sro(ent_emb, rel_embed, triplets, so_csr, dtype)
    return jnp.sum(s * r * o, axis=1, dtype=jnp.float32)


def lp_search_loss(ent_emb, rel_embed, triplets, labels, so_csr=None, dtype=None):
    """BCE-with-logits over pos+neg sampled triplets
    (model_search_lp.py:181-194)."""
    logits = distmult_triplet_score(ent_emb, rel_embed, triplets, so_csr, dtype)
    return jnp.mean(optax_sigmoid_bce(logits, labels))


def lp_search_loss_grouped(
    ent_emb, rel_embed, pos, neg_heads, neg_tails, dtype=None,
    sf_weights=None, gamma: float = 40.0, so_csr=None, neg_csr=None,
):
    """BCE-with-logits over positives + grouped negatives — the same
    objective as :func:`lp_search_loss` on the
    ``negative_sampling_grouped`` layout (data/sampling.py): per
    positive, its ``(s ⊙ r)`` / ``(r ⊙ o)`` row is computed ONCE and
    scored against the whole negative group as a batched contraction.

    vs the flat layout this cuts the entity-table gather and the
    backward grad scatter-add from ``2·P·(1+neg)`` to ``2·P + P·neg``
    rows and the relation gather from ``P·(1+neg)`` to ``P`` rows — the
    flat path's scatter-add is the single largest fusion of the profiled
    search step and is row- (not byte-) bound (NOTES.md roofline).
    Mean semantics match the reference's mean over all pos+neg rows
    (model_search_lp.py:181-194). ``sf_weights`` switches the logits to
    the searched TransE/DistMult mixture (SF_OPS order), the grouped
    form of :func:`mixed_triplet_score`."""
    if dtype is not None:
        ent_emb = ent_emb.astype(dtype)
        rel_embed = rel_embed.astype(dtype)
    p, nh = neg_heads.shape
    nt = neg_tails.shape[1]
    so_idx = jnp.concatenate([pos[:, 0], pos[:, 2]])
    if so_csr is not None:
        from mr_gnas_tpu.kernels.pallas_segment import take_rows_csr

        so = take_rows_csr(ent_emb, so_idx, so_csr)
    else:
        so = jnp.take(ent_emb, so_idx, axis=0, mode="clip")
    s, o = jnp.split(so, 2, axis=0)
    r = take_small_table(rel_embed, pos[:, 1])
    sr = s * r
    ro = r * o
    # direct 2-D takes (no concat/ravel/reshape round-trips) and
    # broadcast-mul-reduce (fuses into the gather consumer; an einsum
    # here lowers to a tiny-batch matmul with layout flips — measured
    # slower). neg_csr (blocked CSR of cat(neg_tails, neg_heads) rows,
    # graph/build.index_csr) routes the backward grad scatter-add —
    # 2x 6.7 ms of row-bound scatter at the 128k headline config —
    # through the one-hot MXU reduction instead.
    if neg_csr is not None:
        from mr_gnas_tpu.kernels.pallas_segment import take_rows_csr

        neg = take_rows_csr(
            ent_emb, jnp.concatenate([neg_tails.ravel(), neg_heads.ravel()]), neg_csr
        )
        nt_rows = neg[: p * nt].reshape(p, nt, -1)
        nh_rows = neg[p * nt :].reshape(p, nh, -1)
    else:
        nt_rows = jnp.take(ent_emb, neg_tails, axis=0, mode="clip")  # [p, nt, D]
        nh_rows = jnp.take(ent_emb, neg_heads, axis=0, mode="clip")  # [p, nh, D]
    pos_logit = jnp.sum(sr * o, axis=1, dtype=jnp.float32)
    logits_t = jnp.sum(sr[:, None, :] * nt_rows, axis=-1, dtype=jnp.float32)
    logits_h = jnp.sum(ro[:, None, :] * nh_rows, axis=-1, dtype=jnp.float32)
    if sf_weights is not None:
        # grouped TransE shares (s + r) / (o - r) per group the same way
        srs, ord_ = s + r, o - r
        te_pos = gamma - jnp.sum(jnp.abs(srs - o), axis=1, dtype=jnp.float32)
        te_t = gamma - jnp.sum(
            jnp.abs(srs[:, None, :] - nt_rows), axis=-1, dtype=jnp.float32
        )
        te_h = gamma - jnp.sum(
            jnp.abs(nh_rows - ord_[:, None, :]), axis=-1, dtype=jnp.float32
        )
        w_te, w_dm = sf_weights[0], sf_weights[1]
        pos_logit = w_te * te_pos + w_dm * pos_logit
        logits_t = w_te * te_t + w_dm * logits_t
        logits_h = w_te * te_h + w_dm * logits_h
    pos_bce = optax_sigmoid_bce(pos_logit, jnp.ones_like(pos_logit))
    neg_logits = jnp.concatenate([logits_t.ravel(), logits_h.ravel()])
    neg_bce = optax_sigmoid_bce(neg_logits, jnp.zeros_like(neg_logits))
    return (jnp.sum(pos_bce) + jnp.sum(neg_bce)) / (p * (1 + nh + nt))


def lp_search_loss_chunked(
    ent_emb, rel_embed, pos, neg_heads, neg_tails, dtype=None,
    sf_weights=None, gamma: float = 40.0,
):
    """BCE-with-logits over positives + CHUNK-SHARED negatives: the P
    positives are split into G contiguous chunks of C = P/G rows and
    every positive in a chunk is scored against the chunk's shared
    negative set. ``neg_heads``/``neg_tails`` are [G, nh]/[G, nt] entity
    ids (data/sampling.negative_sampling_chunked); each positive still
    sees nh + nt negatives, exactly like the grouped layout.

    TPU rationale: the per-positive grouped layout's negative score
    products and their backward are [P, n, D] elementwise slabs plus a
    P*n-row grad scatter-add — together ~1/3 of the profiled 131k-edge
    step (NOTES.md roofline). Sharing negatives within a chunk turns
    both into batched MXU matmuls ([G, C, D] @ [G, D, n] forward,
    [G, C, n] @ [G, n, D] / [G, n, C] @ [G, C, D] backward) and shrinks
    the negative gather + grad scatter from P*n to G*n rows. Per-row BCE
    objective is unchanged; the sampling deviation (negatives drawn once
    per chunk instead of per positive, cf. utils_rgcn.py:198) is the
    chunk-based negative sampling standard in large-scale KGE systems.
    At G == P this is bit-for-bit the grouped layout
    (tests/test_models.py::test_chunked_loss_chunk1_equals_grouped).
    """
    if dtype is not None:
        ent_emb = ent_emb.astype(dtype)
        rel_embed = rel_embed.astype(dtype)
    p = pos.shape[0]
    g_n, nh = neg_heads.shape
    nt = neg_tails.shape[1]
    if p % g_n:
        raise ValueError(f"chunk count {g_n} must divide positives {p}")
    c = p // g_n
    so_idx = jnp.concatenate([pos[:, 0], pos[:, 2]])
    so = jnp.take(ent_emb, so_idx, axis=0, mode="clip")
    s, o = jnp.split(so, 2, axis=0)
    r = take_small_table(rel_embed, pos[:, 1])
    d = s.shape[-1]
    sr = (s * r).reshape(g_n, c, d)
    ro = (r * o).reshape(g_n, c, d)
    nh_rows = jnp.take(ent_emb, neg_heads, axis=0, mode="clip")  # [G, nh, D]
    nt_rows = jnp.take(ent_emb, neg_tails, axis=0, mode="clip")  # [G, nt, D]
    pos_logit = jnp.sum(s * r * o, axis=1, dtype=jnp.float32)
    logits_t = jnp.einsum(
        "gcd,gnd->gcn", sr, nt_rows, preferred_element_type=jnp.float32
    )
    logits_h = jnp.einsum(
        "gcd,gnd->gcn", ro, nh_rows, preferred_element_type=jnp.float32
    )
    if sf_weights is not None:
        # TransE's L1 distance has no matmul form: the mixture keeps the
        # [G, C, n, D] broadcast slabs (same bytes as the grouped layout)
        srs = (s + r).reshape(g_n, c, d)
        ord_ = (o - r).reshape(g_n, c, d)
        te_pos = gamma - jnp.sum(jnp.abs((s + r) - o), axis=1, dtype=jnp.float32)
        te_t = gamma - jnp.sum(
            jnp.abs(srs[:, :, None, :] - nt_rows[:, None, :, :]),
            axis=-1, dtype=jnp.float32,
        )
        te_h = gamma - jnp.sum(
            jnp.abs(nh_rows[:, None, :, :] - ord_[:, :, None, :]),
            axis=-1, dtype=jnp.float32,
        )
        w_te, w_dm = sf_weights[0], sf_weights[1]
        pos_logit = w_te * te_pos + w_dm * pos_logit
        logits_t = w_te * te_t + w_dm * logits_t
        logits_h = w_te * te_h + w_dm * logits_h
    pos_bce = optax_sigmoid_bce(pos_logit, jnp.ones_like(pos_logit))
    neg_logits = jnp.concatenate([logits_t.ravel(), logits_h.ravel()])
    neg_bce = optax_sigmoid_bce(neg_logits, jnp.zeros_like(neg_logits))
    return (jnp.sum(pos_bce) + jnp.sum(neg_bce)) / (p * (1 + nh + nt))


def optax_sigmoid_bce(logits, labels):
    """Numerically stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def bce_probs_loss(
    probs, labels, row_mask=None, col_mask=None, eps: float = 1e-7,
    axis: str | None = None,
):
    """torch.nn.BCELoss over probabilities (train/mr_lp_train.py:116,235).

    ``row_mask`` (0/1 per row) excludes padded batch rows and ``col_mask``
    (0/1 per entity column) excludes padded entity columns from the mean
    exactly — matching the reference, whose tensors are unpadded.

    ``axis``: mesh axis name when the batch ROWS are sharded (the SPMD
    train step, dist/spmd.py) — numerator and row count are psum'd so
    the mean is exact even when padded rows land unevenly across shards.
    """
    p = jnp.clip(probs, eps, 1.0 - eps)
    ll = labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p)
    if row_mask is None and col_mask is None and axis is None:
        return -jnp.mean(ll)
    rm = jnp.ones(probs.shape[0]) if row_mask is None else row_mask
    cm = jnp.ones(probs.shape[1]) if col_mask is None else col_mask
    m = rm[:, None] * cm[None, :]
    num = jnp.sum(ll * m)
    rows = jnp.sum(rm)
    if axis is not None:
        num = jax.lax.psum(num, axis)
        rows = jax.lax.psum(rows, axis)
    return -num / jnp.maximum(rows * jnp.sum(cm), 1.0)


def bce_logits_loss(
    logits, labels, row_mask=None, col_mask=None, axis: str | None = None,
    col_axis: str | None = None,
):
    """BCE-with-logits with the same masked-mean semantics as
    :func:`bce_probs_loss` — identical VALUE (BCELoss(sigmoid(x)) ==
    BCEWithLogits(x)), but a saturation-proof gradient: the probs form's
    eps-clip zeroes the gradient once a decoder saturates (p < 1e-7),
    which stalls ConvE training from its large-magnitude early logits
    (torch's BCELoss backward composes to exactly ``p - y`` per logit,
    so the reference never hits this; NOTES round-3). Ranking on logits
    is identical to ranking on probs (sigmoid is monotone)."""
    ll = optax_sigmoid_bce(logits, labels)  # positive = -log-likelihood
    if row_mask is None and col_mask is None and axis is None and col_axis is None:
        return jnp.mean(ll)
    rm = jnp.ones(logits.shape[0]) if row_mask is None else row_mask
    cm = jnp.ones(logits.shape[1]) if col_mask is None else col_mask
    m = rm[:, None] * cm[None, :]
    num = jnp.sum(ll * m)
    rows = jnp.sum(rm)
    cols = jnp.sum(cm)
    if axis is not None:  # query rows sharded over `axis` (DP analog)
        num = jax.lax.psum(num, axis)
        rows = jax.lax.psum(rows, axis)
    if col_axis is not None:  # entity columns sharded over `col_axis` (TP)
        num = jax.lax.psum(num, col_axis)
        cols = jax.lax.psum(cols, col_axis)
    return num / jnp.maximum(rows * cols, 1.0)


def transe_triplet_score(ent_emb, rel_embed, triplets, gamma: float = 40.0):
    """gamma - ||(s + r) - o||_1 per triplet — the triplet form of
    sf_TransE (operations_lp.py:101-112)."""
    s, r, o = _gather_sro(ent_emb, rel_embed, triplets)
    return gamma - jnp.sum(jnp.abs((s + r) - o), axis=1)


def mixed_triplet_score(
    ent_emb, rel_embed, triplets, sf_weights, gamma: float = 40.0, so_csr=None,
    dtype=None,
):
    """Softmax-weighted mixture of triplet score functions (SF_OPS order:
    TransE, DistMult) — gives ``alphas['final']`` a gradient in the search
    loss, exceeding the reference where Cell_SF is allocated but unused
    (model_search_lp.py:160-161). The (s, r, o) rows are gathered once
    and shared by both score functions."""
    s, r, o = _gather_sro(ent_emb, rel_embed, triplets, so_csr, dtype)
    te = gamma - jnp.sum(jnp.abs((s + r) - o), axis=1, dtype=jnp.float32)
    dm = jnp.sum(s * r * o, axis=1, dtype=jnp.float32)
    return sf_weights[0] * te + sf_weights[1] * dm


def lp_search_loss_sf(
    ent_emb, rel_embed, triplets, labels, sf_weights, gamma=40.0, so_csr=None,
    dtype=None,
):
    """BCE-with-logits over the mixed score-function logits."""
    logits = mixed_triplet_score(
        ent_emb, rel_embed, triplets, sf_weights, gamma, so_csr, dtype
    )
    return jnp.mean(optax_sigmoid_bce(logits, labels))
