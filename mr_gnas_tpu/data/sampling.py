"""Host-side samplers for LP search training.

Numpy ports (device-free, static-shape emitting) of the reference's
sampling pipeline:
  * ``get_adj_and_degrees``            (utils/utils_rgcn.py:18-28)
  * ``sample_edge_uniform``            (utils/utils_rgcn.py:74-77)
  * ``sample_edge_neighborhood``       (utils/utils_rgcn.py:30-72)
  * ``negative_sampling``              (utils/utils_rgcn.py:191-204)
  * ``generate_sampled_graph_and_labels`` (utils/utils_rgcn.py:79-118)

The sampled-graph generator emits a padded :class:`RelGraph` whose static
shape depends only on (sample_size, split_size, n_nodes_pad) so every
search step reuses the same compiled program. Negative-sample triplet
count is exactly ``sample_size * (1 + negative_rate)`` — static by
construction.

A C++ fast path (csrc/sampler.cc, loaded via ctypes) accelerates the
neighborhood sampler on large graphs; the numpy implementation is the
always-available fallback and the parity oracle.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from mr_gnas_tpu.graph.build import build_rel_graph, round_up
from mr_gnas_tpu.graph.container import RelGraph


def get_adj_and_degrees(num_nodes: int, triplets: np.ndarray):
    """Adjacency list of (edge_id, other_vertex) per node + degrees."""
    adj_list = [[] for _ in range(num_nodes)]
    for i, (s, _, o) in enumerate(triplets):
        adj_list[s].append([i, o])
        adj_list[o].append([i, s])
    degrees = np.array([len(a) for a in adj_list])
    adj_list = [np.array(a, dtype=np.int64).reshape(-1, 2) for a in adj_list]
    return adj_list, degrees


def sample_edge_uniform(n_triplets: int, sample_size: int, rng: np.random.Generator):
    """Uniform sample without replacement (utils_rgcn.py:74-77)."""
    return rng.choice(np.arange(n_triplets), sample_size, replace=False)


def sample_edge_neighborhood(
    adj_list, degrees, n_triplets: int, sample_size: int, rng: np.random.Generator
):
    """Connected-subgraph growth sampler (utils_rgcn.py:30-72).

    Uses the native C++ sampler (csrc/sampler.cc) when available — same
    distribution family, different RNG stream; numpy fallback below."""
    from mr_gnas_tpu import native

    flat, off = native.flatten_adj(adj_list)
    out = native.sample_edge_neighborhood_native(
        flat, off, n_triplets, sample_size, int(rng.integers(2**62))
    )
    if out is not None:
        return out
    edges = np.zeros(sample_size, dtype=np.int64)
    sample_counts = np.array(degrees, dtype=np.int64)
    picked = np.zeros(n_triplets, dtype=bool)
    seen = np.zeros(len(degrees), dtype=bool)

    for i in range(sample_size):
        weights = sample_counts * seen
        if np.sum(weights) == 0:
            weights = np.ones_like(weights)
            weights[np.where(sample_counts == 0)] = 0
        probabilities = weights / np.sum(weights)
        chosen_vertex = rng.choice(np.arange(len(degrees)), p=probabilities)
        chosen_adj_list = adj_list[chosen_vertex]
        seen[chosen_vertex] = True
        chosen_edge = chosen_adj_list[rng.integers(chosen_adj_list.shape[0])]
        while picked[chosen_edge[0]]:
            chosen_edge = chosen_adj_list[rng.integers(chosen_adj_list.shape[0])]
        edges[i] = chosen_edge[0]
        picked[chosen_edge[0]] = True
        sample_counts[chosen_vertex] -= 1
        sample_counts[chosen_edge[1]] -= 1
        seen[chosen_edge[1]] = True
    return edges


def negative_sampling(
    pos_samples: np.ndarray, num_entity: int, negative_rate: int, rng: np.random.Generator
):
    """Tile positives x rate, corrupt head or tail u.a.r.
    (utils_rgcn.py:191-204)."""
    size_of_batch = len(pos_samples)
    num_to_generate = size_of_batch * negative_rate
    neg_samples = np.tile(pos_samples, (negative_rate, 1))
    labels = np.zeros(size_of_batch * (negative_rate + 1), dtype=np.float32)
    labels[:size_of_batch] = 1
    values = rng.integers(num_entity, size=num_to_generate)
    choices = rng.uniform(size=num_to_generate)
    subj = choices > 0.5
    obj = choices <= 0.5
    neg_samples[subj, 0] = values[subj]
    neg_samples[obj, 2] = values[obj]
    return np.concatenate((pos_samples, neg_samples)), labels


def negative_sampling_grouped(
    pos_samples: np.ndarray, num_entity: int, negative_rate: int,
    rng: np.random.Generator,
):
    """Grouped negatives: per positive, exactly ``negative_rate // 2``
    corrupted heads and ``negative_rate - negative_rate // 2`` corrupted
    tails, returned as [P, nh] / [P, nt] entity-id arrays.

    Same corruption distribution as :func:`negative_sampling`
    (utils_rgcn.py:191-204) except the head-vs-tail choice is a fixed
    half/half split per positive instead of per-row Bernoulli(0.5) — a
    documented deviation that lets the loss share each positive's
    uncorrupted (s ⊙ r) / (r ⊙ o) row across its negative group, cutting
    the entity-table gather AND the grad scatter-add rows ~2x (the
    single largest fusion of the profiled search step, NOTES.md)."""
    p = len(pos_samples)
    nh = negative_rate // 2
    nt = negative_rate - nh
    neg_heads = rng.integers(num_entity, size=(p, nh))
    neg_tails = rng.integers(num_entity, size=(p, nt))
    return neg_heads.astype(np.int32), neg_tails.astype(np.int32)


def negative_sampling_chunked(
    n_positives: int, num_entity: int, negative_rate: int, chunk: int,
    rng: np.random.Generator,
):
    """Chunk-shared negatives: split the P positives into G contiguous
    chunks of ~``chunk`` rows and draw ONE negative set per chunk
    (``negative_rate // 2`` heads + the rest tails, as in
    :func:`negative_sampling_grouped`), returned as [G, nh] / [G, nt]
    entity ids. G is the largest divisor of P with P/G >= chunk
    (G = 1 when P <= chunk), so the loss can reshape positives to
    [G, P/G, D] statically.

    This is the chunk-based negative sampling used by large-scale KGE
    systems: sharing a chunk's negatives lets the score products run as
    batched MXU matmuls instead of [P, n, D] broadcast slabs and cuts
    negative gather/scatter rows P*n -> G*n (models/lp.py
    ``lp_search_loss_chunked``). Deviation from utils_rgcn.py:191-204 is
    the same as the grouped layout plus within-chunk sharing."""
    g = max(1, n_positives // max(chunk, 1))
    while n_positives % g:
        g -= 1
    nh = negative_rate // 2
    nt = negative_rate - nh
    neg_heads = rng.integers(num_entity, size=(g, nh))
    neg_tails = rng.integers(num_entity, size=(g, nt))
    return neg_heads.astype(np.int32), neg_tails.astype(np.int32)


@dataclasses.dataclass
class SampledBatch:
    """One LP search step's device inputs."""

    graph: RelGraph
    triplets: np.ndarray  # [T, 3] local (s, r, o), T = sample_size*(1+neg)
    labels: np.ndarray  # [T] 1/0
    # grouped-negative mode (see negative_sampling_grouped): triplets
    # holds ONLY the positives [P, 3], labels is empty, and these carry
    # the per-positive corrupted entity ids. In chunk-shared mode
    # (negative_sampling_chunked) they are [G, .] with G dividing P.
    neg_heads: np.ndarray | None = None  # [P, neg//2]
    neg_tails: np.ndarray | None = None  # [P, neg - neg//2]


def generate_sampled_graph_and_labels(
    triplets: np.ndarray,
    sample_size: int,
    split_size: float,
    num_rels: int,
    adj_list,
    degrees,
    negative_rate: int,
    sampler: str = "uniform",
    rng: np.random.Generator | None = None,
    n_nodes_pad: int | None = None,
    n_fwd_pad: int | None = None,
    grouped: bool = False,
    neg_chunk: int = 0,
) -> SampledBatch:
    """Sample edges, relabel compactly, negative-sample, split graph-vs-
    supervision halves, and build the padded training RelGraph
    (utils_rgcn.py:79-118). ``grouped=True`` emits per-positive negative
    groups (negative_sampling_grouped) for the grouped search loss."""
    rng = rng or np.random.default_rng()
    if sampler == "uniform":
        edges = sample_edge_uniform(len(triplets), sample_size, rng)
    elif sampler == "neighbor":
        edges = sample_edge_neighborhood(
            adj_list, degrees, len(triplets), sample_size, rng
        )
    else:
        raise ValueError("sampler must be 'uniform' or 'neighbor'")

    chosen = triplets[edges]
    src, rel, dst = chosen.T
    uniq_v, inv = np.unique((src, dst), return_inverse=True)
    src, dst = np.reshape(inv, (2, -1))
    relabeled = np.stack((src, rel, dst)).T

    if grouped:
        if neg_chunk > 0:
            neg_heads, neg_tails = negative_sampling_chunked(
                len(relabeled), len(uniq_v), negative_rate, neg_chunk, rng
            )
        else:
            neg_heads, neg_tails = negative_sampling_grouped(
                relabeled, len(uniq_v), negative_rate, rng
            )
        samples = relabeled
        labels = np.ones(len(relabeled), dtype=np.float32)
    else:
        neg_heads = neg_tails = None
        samples, labels = negative_sampling(relabeled, len(uniq_v), negative_rate, rng)

    n_graph = int(sample_size * split_size)
    graph_ids = rng.choice(np.arange(sample_size), size=n_graph, replace=False)
    g_src, g_rel, g_dst = src[graph_ids], rel[graph_ids], dst[graph_ids]

    if n_nodes_pad is None:
        n_nodes_pad = round_up(2 * sample_size, 64)
    graph = build_rel_graph(
        np.stack([g_src, g_rel, g_dst]).T,
        num_nodes=len(uniq_v),
        num_rels=num_rels,
        n_fwd_pad=n_fwd_pad or n_graph,
        n_nodes_pad=n_nodes_pad,
        global_ids=uniq_v,
    )
    return SampledBatch(
        graph=graph, triplets=samples.astype(np.int32), labels=labels,
        neg_heads=neg_heads, neg_tails=neg_tails,
    )
