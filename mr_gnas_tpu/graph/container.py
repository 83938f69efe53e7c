"""Static-shape multi-relational graph containers.

The LP stack of the reference represents all per-edge tensors in a fixed
``[forward edges | inverse edges | self-loops]`` row layout of length
``E + N`` (reference: models/model_lp.py:126-129,
models/model_search_lp.py:135-139; consumed by slicing in
models/operations_lp.py:275-287). We make that layout an explicit,
padded, statically-shaped dataclass so every sampled graph compiles to
the same XLA program.

Row layout of :class:`RelGraph` (R = n_edge_rows + n_nodes rows total):

  rows [0, n_fwd)                  forward edges   (etype in [0, num_rels))
  rows [n_fwd, 2*n_fwd)            inverse edges   (etype in [num_rels, 2*num_rels))
  rows [2*n_fwd, 2*n_fwd+n_nodes)  self-loop rows  (etype == 2*num_rels)

All three sections are padded to their static sizes; ``row_mask`` marks
real rows. Padded edge rows carry ``dst == n_nodes`` (a dummy segment
dropped by the segment kernels) and ``src == 0``.

Edges within the fwd/inv sections are sorted by (etype, dst, src) — the
relation-sorted canonical layout of the reference's search-path graphs
(utils/utils_rgcn.py:151-152), which doubles as a segmented-by-relation
layout for relation-batched kernels.
"""
from __future__ import annotations

import flax.struct
import jax


@flax.struct.dataclass
class RelGraph:
    """A padded multi-relational graph in edge-row layout.

    Attributes:
      src:       [R] int32. Local node index feeding each row (for self rows,
                 the node itself). Padded rows: 0.
      dst:       [R] int32. Destination node of each row (for self rows, the
                 node itself). Padded edge rows: n_nodes (dummy segment).
      etype:     [R] int32. Relation id per row; inverse edges use
                 rel + num_rels, self rows use 2*num_rels. Padded rows use
                 the self-loop id.
      norm:      [R] f32. Symmetric degree norm deg_dst^-1/2 * deg_src^-1/2
                 on edge rows (reference: train/mr_lp_train.py:86,
                 search/mr_lp_search.py:35); 1.0 on self and padded rows.
      row_mask:  [R] f32 (0/1). 1 for real rows.
      global_ids:[n_nodes] int32. Local node -> global entity id (identity
                 for full graphs; the `uniq_v` relabeling of sampled graphs,
                 reference utils/utils_rgcn.py:97). Padded nodes: 0.
      node_mask: [n_nodes] f32 (0/1). 1 for real nodes.
      n_fwd:     static int, padded forward-edge count (== inverse count).
      n_nodes:   static int, padded node count.
      num_rels:  static int, number of *original* (forward) relations.
    """

    src: jax.Array
    dst: jax.Array
    etype: jax.Array
    norm: jax.Array
    row_mask: jax.Array
    global_ids: jax.Array
    node_mask: jax.Array
    n_fwd: int = flax.struct.field(pytree_node=False)
    n_nodes: int = flax.struct.field(pytree_node=False)
    num_rels: int = flax.struct.field(pytree_node=False)
    # optional blocked-CSR index over the edge rows; when present, the LP
    # aggregators route through the Pallas segment kernels
    # (kernels/pallas_segment.py) instead of XLA scatters
    csr: object = None
    # optional blocked-CSR of the src array itself (segments = node ids);
    # when present, the per-layer ent_emb[src] re-gathers use
    # take_rows_csr so their gradient is an MXU one-hot sum instead of a
    # scatter-add (graph/build.attach_gather_csr)
    src_csr: object = None
    # ---- sharded-local view (dist/spmd.py) ----------------------------
    # When spmd_axis is set, this RelGraph is ONE DEVICE's shard inside a
    # jax.shard_map: the fwd/inv edge sections are this device's
    # contiguous slices of the relation-sorted edge list, the self rows /
    # node_mask cover only this device's node slice (n_nodes rows), while
    # src/dst still hold GLOBAL node ids into the n_nodes_global node
    # space. The cells then psum batch-norm statistics and merge the
    # middle-stage aggregation partials over spmd_axis (reduce-scatter /
    # all-to-all max) instead of producing replicated [N, D] tensors —
    # SURVEY §2.9's edge-partitioned aggregation design.
    spmd_axis: str | None = flax.struct.field(pytree_node=False, default=None)
    # global (padded) node count; 0 means n_nodes (unsharded view)
    n_nodes_global: int = flax.struct.field(pytree_node=False, default=0)
    # per-row GLOBAL entity id (= global_ids[src] precomputed host-side;
    # the sharded-local view has no full global_ids array)
    src_gid: object = None

    @property
    def agg_nodes(self) -> int:
        """Aggregation target count: global nodes in the sharded-local
        view, n_nodes otherwise."""
        return self.n_nodes_global or self.n_nodes

    @property
    def n_edge_rows(self) -> int:
        """Number of (padded) edge rows E = 2 * n_fwd."""
        return 2 * self.n_fwd

    @property
    def n_rows(self) -> int:
        """Total rows R = E + N."""
        return 2 * self.n_fwd + self.n_nodes

    @property
    def num_rels_total(self) -> int:
        """Total relation vocabulary: fwd + inv + self (2*num_rels + 1).

        Mirrors ``num_rel = num_rels * 2 + 1`` (reference
        models/model_search_lp.py:24)."""
        return 2 * self.num_rels + 1

    @property
    def edge_mask(self) -> jax.Array:
        """[E] mask over edge rows only."""
        return self.row_mask[: self.n_edge_rows]


@flax.struct.dataclass
class Block:
    """One message-flow-graph (MFG) layer for NC minibatch training.

    The reference extracts per-hop bipartite blocks with DGL's C++
    MultiLayerFullNeighborSampler (search/mr_nc_search.py:43-46) and feeds
    each block's per-edge *global* src node ids and etypes into the cell
    (models/model_search.py:143-166). We precompute, host-side, padded
    index arrays so the device forward is pure gather + segment ops.

    Attributes:
      src_gid:   [E] int32. Global node id of each edge's source (used only
                 at layer 0 for the embedding lookup).
      src_pos:   [E] int32. Position of each edge's source within the
                 *previous* layer's dst-node array (replaces the O(N*E)
                 remap loop at models/model_search.py:167-171). For layer 0
                 this indexes src_gid ordering and is unused.
      dst_pos:   [E] int32. Position of each edge's destination within this
                 block's dst-node array. Padded edges: n_dst.
      etype:     [E] int32. Relation id of each edge.
      edge_mask: [E] f32 (0/1).
      dst_gid:   [n_dst] int32. Global ids of this block's dst nodes.
      dst_mask:  [n_dst] f32 (0/1).
      n_edges:   static int (padded).
      n_dst:     static int (padded).
    """

    src_gid: jax.Array
    src_pos: jax.Array
    dst_pos: jax.Array
    etype: jax.Array
    edge_mask: jax.Array
    dst_gid: jax.Array
    dst_mask: jax.Array
    n_edges: int = flax.struct.field(pytree_node=False)
    n_dst: int = flax.struct.field(pytree_node=False)
    # sharded-local view (dist/spmd.build_local_blocks): edge rows are
    # this device's slice, dst_gid/dst_mask its dst-node block; dst_pos/
    # src_pos keep GLOBAL positions into n_dst_global / the previous
    # block's global dst space
    spmd_axis: str | None = flax.struct.field(pytree_node=False, default=None)
    n_dst_global: int = flax.struct.field(pytree_node=False, default=0)


def as_edge_graph(block: Block) -> "EdgeGraph":
    """View a Block as the minimal graph interface the NC ops consume."""
    return EdgeGraph(
        dst=block.dst_pos,
        edge_mask=block.edge_mask,
        node_mask=block.dst_mask,
        n_edges=block.n_edges,
        n_nodes=block.n_dst,
        spmd_axis=block.spmd_axis,
        n_nodes_global=block.n_dst_global,
    )


@flax.struct.dataclass
class EdgeGraph:
    """Minimal per-edge graph view used by NC aggregation ops.

    NC ops operate on [E, D] per-edge tensors and segment-reduce to
    [n_nodes, D] (reference models/operations.py:109-164).

    Sharded-local view (dist/spmd.py): when ``spmd_axis`` is set this is
    ONE device's shard inside a jax.shard_map — edge rows are this
    device's contiguous slice, ``node_mask`` covers only its dst-node
    block (n_nodes rows), while ``dst`` holds GLOBAL dst positions into
    the ``n_nodes_global`` space; the NC cells psum BN statistics and
    merge aggregation partials over the axis.
    """

    dst: jax.Array
    edge_mask: jax.Array
    node_mask: jax.Array
    n_edges: int = flax.struct.field(pytree_node=False)
    n_nodes: int = flax.struct.field(pytree_node=False)
    spmd_axis: str | None = flax.struct.field(pytree_node=False, default=None)
    n_nodes_global: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def agg_nodes(self) -> int:
        """Aggregation target count (global in the sharded-local view)."""
        return self.n_nodes_global or self.n_nodes
