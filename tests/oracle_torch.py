"""Torch oracle of the reference MR-GNAS networks (no DGL required).

A line-faithful torch replica of the reference's models so full-model
per-layer parity can be asserted in-environment (BASELINE.md: "per-layer
activations allclose vs reference on fixed genotypes"):

  * LP fixed-genotype network  — models/model_lp.py:13-150 with the op
    library models/operations_lp.py;
  * LP supernet (weight-sharing) network — models/model_search_lp.py:16-163
    with models/cell_lp.py:12-200;
  * NC fixed-genotype network  — models/model.py:10-199 with
    models/operations.py.

The only DGL calls the reference makes are ``update_all(copy_edge,
max/mean/sum)`` segment reductions (operations_lp.py:233,248,262;
operations.py:119,138,159) and graph bookkeeping; here they are replaced
by ``torch.scatter_reduce``/``index_add`` with DGL's zero-degree
semantics (nodes receiving no message get 0) and by plain index arrays.

Weight transplant helpers copy a flax parameter tree (flattened with '/'
separators) into the torch modules, transposing Linear kernels at the
boundary ([in, out] -> [out, in]) and tracking consumed keys so tests can
assert the mapping is exhaustive.

NOTE: this file intentionally mirrors the reference's module structure —
it exists to BE the reference for numerical comparison (the reference is
MIT-licensed; replication here is the entire point of an oracle, and it
is test-only code, never imported by the framework).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# segment reductions with DGL semantics (empty destination -> 0)
# ---------------------------------------------------------------------------


def seg_sum(msg: torch.Tensor, dst: torch.Tensor, n: int) -> torch.Tensor:
    out = torch.zeros(n, msg.shape[1], dtype=msg.dtype)
    out.index_add_(0, dst, msg)
    return out


def seg_count(dst: torch.Tensor, n: int) -> torch.Tensor:
    return torch.bincount(dst, minlength=n).to(torch.float32)


def seg_mean(msg: torch.Tensor, dst: torch.Tensor, n: int) -> torch.Tensor:
    s = seg_sum(msg, dst, n)
    c = seg_count(dst, n).clamp(min=1.0)
    out = s / c[:, None]
    out[seg_count(dst, n) == 0] = 0.0
    return out


def seg_max(msg: torch.Tensor, dst: torch.Tensor, n: int) -> torch.Tensor:
    out = torch.full((n, msg.shape[1]), -float("inf"), dtype=msg.dtype)
    out.scatter_reduce_(
        0, dst[:, None].expand_as(msg), msg, reduce="amax", include_self=True
    )
    out[seg_count(dst, n) == 0] = 0.0
    return out


def seg_std(msg: torch.Tensor, dst: torch.Tensor, n: int, eps: float = 1e-5):
    m = seg_mean(msg, dst, n)
    m2 = seg_mean(msg * msg, dst, n)
    return torch.sqrt(torch.relu(m2 - m * m) + eps)


# ---------------------------------------------------------------------------
# graph structs standing in for the DGL graph / blocks
# ---------------------------------------------------------------------------


class LPGraph:
    """The LP full graph of train/mr_lp_train.py:77-89 in plain tensors.

    Edges are [forward | inverse] (E = 2*T rows); ops additionally see the
    self rows E..E+N of the per-row tensors.
    """

    def __init__(self, triplets: np.ndarray, num_ent: int, num_rels: int):
        t = np.asarray(triplets, dtype=np.int64)
        src = np.concatenate([t[:, 0], t[:, 2]])
        dst = np.concatenate([t[:, 2], t[:, 0]])
        etype = np.concatenate([t[:, 1], t[:, 1] + num_rels])
        self.src = torch.tensor(src)
        self.dst = torch.tensor(dst)
        self.e_type = torch.tensor(etype)
        self.num_ent = num_ent
        self.num_rels = num_rels
        # norm = in_deg^-0.5(dst) * in_deg^-0.5(src) over the bidirectional
        # graph (train/mr_lp_train.py:82-86)
        deg = np.bincount(dst, minlength=num_ent).astype(np.float64)
        with np.errstate(divide="ignore"):
            nn_ = deg ** -0.5
        nn_[np.isinf(nn_)] = 0.0
        self.norm = torch.tensor((nn_[dst] * nn_[src]).astype(np.float32))

    def num_edges(self) -> int:
        return int(self.src.shape[0])

    def nodes(self) -> torch.Tensor:
        return torch.arange(self.num_ent)

    @property
    def src_id_final(self) -> torch.Tensor:
        """cat(edge srcs, all node ids) (model_lp.py:127)."""
        return torch.cat([self.src, self.nodes()])

    @property
    def edge_type_final(self) -> torch.Tensor:
        """cat(etypes, self_rel) (model_lp.py:128-129)."""
        self_rel = torch.full((self.num_ent,), 2 * self.num_rels, dtype=torch.long)
        return torch.cat([self.e_type, self_rel])


# ---------------------------------------------------------------------------
# LP op library (operations_lp.py)
# ---------------------------------------------------------------------------


class PreMult(nn.Module):
    def forward(self, g, h, hr):
        return h * hr


class PreSub(nn.Module):
    def forward(self, g, h, hr):
        return h - hr


class PreAdd(nn.Module):
    def forward(self, g, h, hr):
        return h + hr


class PreCorr(nn.Module):
    """ccorr via rFFT — the live semantics of operations_lp.py:47-59
    (modern torch.fft in place of the removed torch.rfft API)."""

    def forward(self, g, h, hr):
        fa = torch.fft.rfft(h, dim=-1)
        fb = torch.fft.rfft(hr, dim=-1)
        return torch.fft.irfft(torch.conj(fa) * fb, n=h.shape[-1], dim=-1)


class FZero(nn.Module):
    def forward(self, g, h, h_in):
        return 0 * h


class FIdentity(nn.Module):
    def forward(self, g, h, h_in):
        return h


class FDense(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.W = nn.Linear(2 * d, d, bias=True)

    def forward(self, g, h, h_in):
        return torch.sigmoid(self.W(torch.cat([h, h_in], dim=1))) * h


class FSparse(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.W = nn.Linear(2 * d, d, bias=True)
        self.a = nn.Linear(d, 1, bias=False)

    def forward(self, g, h, h_in):
        return torch.sigmoid(self.a(self.W(torch.cat([h, h_in], dim=1)))) * h


class FDenseLast(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.W = nn.Linear(d, d, bias=True)

    def forward(self, g, h, h_in):
        return torch.sigmoid(self.W(h)) * h


class FSparseLast(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.W = nn.Linear(d, d, bias=True)
        self.a = nn.Linear(d, 1, bias=False)

    def forward(self, g, h, h_in):
        return torch.sigmoid(self.a(self.W(h))) * h


class FComp(nn.Module):
    """operations_lp.py:266-288 — note the *unscaled* self section."""

    def __init__(self, d):
        super().__init__()
        self.W_in = nn.Linear(2 * d, d, bias=False)
        self.W_out = nn.Linear(2 * d, d, bias=False)
        self.W_self = nn.Linear(2 * d, d, bias=False)

    def forward(self, g, h, h_in):
        e = g.num_edges()
        m_in = self.W_in(torch.cat([h[: e // 2], h_in[: e // 2]], dim=1))
        m_out = self.W_out(torch.cat([h[e // 2 : e], h_in[e // 2 : e]], dim=1))
        m_self = self.W_self(torch.cat([h[e:], h_in[e:]], dim=1))
        m_in_out = torch.cat((m_in / 3, m_out / 3), dim=0) * g.norm.view(-1, 1)
        return torch.cat((m_in_out, m_self), dim=0)


class _FGateComp(nn.Module):
    """Shared body of f_sparse_comp / f_dense_comp
    (operations_lp.py:304-343, 356-390)."""

    def __init__(self, d, scalar):
        super().__init__()
        self.scalar = scalar
        self.W_in = nn.Linear(2 * d, d, bias=True)
        self.W_out = nn.Linear(2 * d, d, bias=True)
        self.W_self = nn.Linear(2 * d, d, bias=True)
        if scalar:
            self.a_in = nn.Linear(d, 1, bias=False)
            self.a_out = nn.Linear(d, 1, bias=False)
            self.a_self = nn.Linear(d, 1, bias=False)

    def _gate(self, W, a, h, h_in):
        z = W(torch.cat([h, h_in], dim=1))
        if self.scalar:
            z = a(z)
        return torch.sigmoid(z) * h

    def forward(self, g, h, h_in):
        e = g.num_edges()
        out_in = self._gate(
            self.W_in, getattr(self, "a_in", None), h[: e // 2], h_in[: e // 2]
        )
        out_o = self._gate(
            self.W_out, getattr(self, "a_out", None), h[e // 2 : e], h_in[e // 2 : e]
        )
        out_self = self._gate(self.W_self, getattr(self, "a_self", None), h[e:], h_in[e:])
        m_in_out = torch.cat((out_in / 3, out_o / 3), dim=0) * g.norm.view(-1, 1)
        return torch.cat((m_in_out, out_self / 3), dim=0)


class FSparseComp(_FGateComp):
    def __init__(self, d):
        super().__init__(d, scalar=True)


class FDenseComp(_FGateComp):
    def __init__(self, d):
        super().__init__(d, scalar=False)


class AMaxLP(nn.Module):
    """operations_lp.py:223-235: relu(Linear(h[:E])) -> seg max + self rows."""

    def __init__(self, d):
        super().__init__()
        self.linear = nn.Linear(d, d)

    def forward(self, g, h, h_in):
        e = g.num_edges()
        msg = F.relu(self.linear(h[:e]))
        return seg_max(msg, g.dst, g.num_ent) + h[e:]


class AMeanLP(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.linear = nn.Linear(d, d)

    def forward(self, g, h, h_in):
        e = g.num_edges()
        msg = F.relu(self.linear(h[:e]))
        return seg_mean(msg, g.dst, g.num_ent) + h[e:]


class ASumLP(nn.Module):
    """Sum reduce; dropout is identity here (tests run deterministic)."""

    def __init__(self, d):
        super().__init__()

    def forward(self, g, h, h_in):
        e = g.num_edges()
        return seg_sum(h[:e], g.dst, g.num_ent) + h[e:]


LP_OPS = {
    "pre_mult": lambda d: PreMult(),
    "pre_sub": lambda d: PreSub(),
    "pre_add": lambda d: PreAdd(),
    "pre_corr": lambda d: PreCorr(),
    "f_zero": lambda d: FZero(),
    "f_identity": lambda d: FIdentity(),
    "f_dense": lambda d: FDense(d),
    "f_sparse": lambda d: FSparse(d),
    "f_dense_comp": lambda d: FDenseComp(d),
    "f_sparse_comp": lambda d: FSparseComp(d),
    "f_comp": lambda d: FComp(d),
    "f_dense_last": lambda d: FDenseLast(d),
    "f_sparse_last": lambda d: FSparseLast(d),
    "a_max": lambda d: AMaxLP(d),
    "a_mean": lambda d: AMeanLP(d),
    "a_sum": lambda d: ASumLP(d),
}


# ---------------------------------------------------------------------------
# LP fixed-genotype network (models/model_lp.py)
# ---------------------------------------------------------------------------


class LPOpModule(nn.Module):
    """model_lp.py:13-35 incl. the BN-condition quirk: the python
    expression at :31 only short-circuits for pre_mult, so BN+ReLU run
    after every other op including pre_add/pre_sub."""

    def __init__(self, d, op_name):
        super().__init__()
        self.op = LP_OPS[op_name](d)
        self.op_name = op_name
        self.batchnorm_h = nn.BatchNorm1d(d)

    def forward(self, g, h, h_in):
        h = self.op(g, h, h_in)
        if self.op_name != "pre_mult":
            h = self.batchnorm_h(h)
            h = torch.relu(h)
        return h


class LPCell(nn.Module):
    """model_lp.py:38-74."""

    def __init__(self, d, genotype):
        super().__init__()
        self._genotype = genotype
        self._nb_nodes = len({gene[1] for gene in genotype.alpha_cell})
        self._concat = list(genotype.concat_node) or list(
            range(1, 1 + self._nb_nodes)
        )
        self.batchnorm_h = nn.BatchNorm1d(d)
        self._ops = nn.ModuleList(
            [nn.ModuleList([nn.ModuleList() for _ in range(n)]) for n in range(1, 1 + self._nb_nodes)]
        )
        for op_name, center, pre in genotype.alpha_cell:
            self._ops[center - 1][pre].append(LPOpModule(d, op_name))
        self.concat = nn.Linear(len(self._concat) * d, d)

    def forward(self, g, src_emb, hr):
        zero_out = self._ops[0][0][0](g, src_emb, hr)
        states = [src_emb, zero_out]
        for n in range(1, self._nb_nodes):
            hs = []
            for i in range(n + 1):
                if len(self._ops[n][i]) > 0:
                    hs.append(self._ops[n][i][0](g, states[i], zero_out))
            states.append(sum(hs))
        states = [states[idx] for idx in self._concat]
        h = self.concat(torch.cat(states, dim=1))
        h = self.batchnorm_h(h)
        return torch.relu(h)


class LPNetworkOracle(nn.Module):
    """model_lp.py:77-150 (score function: DistMult 1-vs-N)."""

    def __init__(self, genotypes, num_ent, num_rels, d, init_dim, num_base_r):
        super().__init__()
        self.num_ent = num_ent
        self.num_rel = 2 * num_rels + 1
        self.embedding_h = nn.Embedding(num_ent, init_dim)
        self.embedding_e = nn.Embedding(num_base_r, d)
        self.linear_e = nn.Linear(init_dim, d)
        self.rel_wt = nn.Parameter(torch.zeros(self.num_rel, num_base_r))
        self.w_rel = nn.Parameter(torch.zeros(d, d))
        self.cells = nn.ModuleList([LPCell(d, g) for g in genotypes])

    def encode(self, g: LPGraph):
        """_forward_lp's cell walk (model_lp.py:124-133); returns per-layer
        (ent_emb, rel_embed) traces."""
        all_ent = self.linear_e(self.embedding_h.weight)
        rel_embed = self.rel_wt @ self.embedding_e.weight
        src_id_final = g.src_id_final
        edge_type_final = g.edge_type_final
        trace = []
        ent = all_ent
        for cell in self.cells:
            ent = cell(g, ent[src_id_final], rel_embed[edge_type_final])
            rel_embed = rel_embed @ self.w_rel
            trace.append((ent, rel_embed))
        return ent, rel_embed, trace

    def forward(self, g: LPGraph, subj, rel):
        ent, rel_embed, _ = self.encode(g)
        obj = ent[subj] * rel_embed[rel]
        return torch.sigmoid(obj @ ent.T)


# ---------------------------------------------------------------------------
# LP supernet (models/cell_lp.py + model_search_lp.py)
# ---------------------------------------------------------------------------

LP_PRE_OPS = ["pre_mult", "pre_sub", "pre_add"]
LP_FIRST_OPS = ["f_zero", "f_identity", "f_dense_comp", "f_sparse_comp", "f_comp"]
LP_MIDDLE_OPS = ["a_max", "a_sum", "a_mean"]
LP_LAST_OPS = ["f_zero", "f_identity", "f_dense_last", "f_sparse_last"]


class LPMixedOp(nn.Module):
    """cell_lp.py:12-33: per-op [op, BN, ReLU] pipeline, weighted sum."""

    def __init__(self, d, op_names):
        super().__init__()
        self.op_names = list(op_names)
        self.ops = nn.ModuleList([LP_OPS[n](d) for n in op_names])
        self.bns = nn.ModuleList([nn.BatchNorm1d(d) for _ in op_names])

    def forward(self, weights, g, h, h_in):
        out = 0
        for w, op, bn in zip(weights, self.ops, self.bns):
            out = out + w * torch.relu(bn(op(g, h, h_in)))
        return out


class LPSupernetCell(nn.Module):
    """cell_lp.py:155-188 (zero -> first -> middle -> last -> concat)."""

    def __init__(self, d, first_nodes, last_nodes):
        super().__init__()
        self.first_nodes = first_nodes
        self.last_nodes = last_nodes
        self.zero = LPMixedOp(d, LP_PRE_OPS)
        self.first = nn.ModuleList()
        for i in range(first_nodes):
            for _ in range(i + 1):
                self.first.append(LPMixedOp(d, LP_FIRST_OPS))
        self.middle = nn.ModuleList(
            [LPMixedOp(d, LP_MIDDLE_OPS) for _ in range(first_nodes)]
        )
        self.last = nn.ModuleList()
        for i in range(last_nodes):
            for _ in range(first_nodes + i):
                self.last.append(LPMixedOp(d, LP_LAST_OPS))
        self.concat_weights = nn.Linear((first_nodes + last_nodes) * d, d)

    def forward(self, g, src_emb, hr, w_zero, w_first, w_middle, w_last):
        h_in = self.zero(w_zero[0], g, src_emb, hr)
        states = [h_in]
        offset = 0
        for _ in range(self.first_nodes):
            s = sum(
                self.first[offset + j](w_first[offset + j], g, h, h_in)
                for j, h in enumerate(states)
            )
            offset += len(states)
            states.append(s)
        states = states[1:]
        states = [
            self.middle[i](w_middle[i], g, states[i], h_in)
            for i in range(self.first_nodes)
        ]
        offset = 0
        for _ in range(self.last_nodes):
            s = sum(
                self.last[offset + j](w_last[offset + j], g, h, h_in)
                for j, h in enumerate(states)
            )
            offset += len(states)
            states.append(s)
        return self.concat_weights(torch.cat(states, dim=1))


class LPSupernetOracle(nn.Module):
    """model_search_lp.py:16-163 with explicit per-layer weights."""

    def __init__(self, num_ent, num_rels, layers, first_nodes, last_nodes, d, init_dim, num_base_r):
        super().__init__()
        self.num_ent = num_ent
        self.num_rel = 2 * num_rels + 1
        self.layers = layers
        self.embedding_h = nn.Embedding(num_ent, init_dim)
        self.embedding_e = nn.Embedding(num_base_r, d)
        self.linear_e = nn.Linear(init_dim, d)
        self.rel_wt = nn.Parameter(torch.zeros(self.num_rel, num_base_r))
        self.w_rel = nn.Parameter(torch.zeros(d, d))
        self.cells = nn.ModuleList(
            [LPSupernetCell(d, first_nodes, last_nodes) for _ in range(layers)]
        )
        self.batchnorm_h = nn.BatchNorm1d(d)

    def forward(self, g: LPGraph, layer_weights):
        """layer_weights[i] = (w_zero, w_first, w_middle, w_last); returns
        per-layer traces mirroring _forward_lp (model_search_lp.py:131-163,
        dropout omitted — tests run with dropout 0)."""
        all_ent = self.linear_e(self.embedding_h.weight)
        rel_embed = self.rel_wt @ self.embedding_e.weight
        src_id_final = g.src_id_final
        edge_type_final = g.edge_type_final
        trace = []
        ent = None
        for i, cell in enumerate(self.cells):
            wz, wf, wm, wl = layer_weights[i]
            ent_in = all_ent[src_id_final] if i == 0 else torch.cat(
                [ent[g.src], ent], dim=0
            )
            ent = cell(g, ent_in, rel_embed[edge_type_final], wz, wf, wm, wl)
            ent = self.batchnorm_h(ent)
            # ReLU-skip rule (model_search_lp.py:146-148,155-156)
            if i > 0 or self.layers == 1:
                ent = torch.relu(ent)
            rel_embed = rel_embed @ self.w_rel
            trace.append((ent, rel_embed))
        return ent, rel_embed, trace


# ---------------------------------------------------------------------------
# NC op library (models/operations.py) and fixed-genotype network (model.py)
# ---------------------------------------------------------------------------


class NCBlock:
    """One full-neighbor MFG hop in plain tensors (the DGL block analog).

    dst_nodes are the hop's output nodes (global ids); edges carry global
    src/dst ids and relation types. ``dst_pos`` maps each edge to its dst
    node's row.
    """

    def __init__(self, src, dst, etype, dst_nodes):
        self.src = np.asarray(src, dtype=np.int64)
        self.dst = np.asarray(dst, dtype=np.int64)
        self.etype = torch.tensor(np.asarray(etype, dtype=np.int64))
        self.dst_nodes = np.asarray(dst_nodes, dtype=np.int64)
        pos = {int(v): p for p, v in enumerate(self.dst_nodes)}
        self.dst_pos = torch.tensor([pos[int(v)] for v in self.dst])
        self.n_dst = len(self.dst_nodes)


def build_nc_blocks(src, dst, etype, seeds, layers):
    """Naive full-neighbor block extraction (the DGL
    MultiLayerFullNeighborSampler analog, search/mr_nc_search.py:43-46):
    pure python, independent of mr_gnas_tpu.data.blocks."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    etype = np.asarray(etype)
    needed = list(dict.fromkeys(int(s) for s in seeds))
    blocks = [None] * layers
    for i in range(layers - 1, -1, -1):
        need_set = set(needed)
        sel = np.array([j for j in range(len(dst)) if int(dst[j]) in need_set], dtype=np.int64)
        blocks[i] = NCBlock(src[sel], dst[sel], etype[sel], np.array(needed))
        extra = [int(v) for v in np.unique(src[sel]) if int(v) not in need_set]
        needed = needed + sorted(extra)
    return blocks


class NCOpAMax(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.linear = nn.Linear(d, d)

    def forward(self, block, h, h_in):
        msg = F.relu(self.linear(h))
        return seg_max(msg, block.dst_pos, block.n_dst)


class NCOpAMean(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.linear = nn.Linear(d, d)

    def forward(self, block, h, h_in):
        msg = F.relu(self.linear(h))
        return seg_mean(msg, block.dst_pos, block.n_dst)


class NCOpASum(nn.Module):
    def __init__(self, d):
        super().__init__()

    def forward(self, block, h, h_in):
        return seg_sum(h, block.dst_pos, block.n_dst)


class NCOpAStd(nn.Module):
    def __init__(self, d):
        super().__init__()

    def forward(self, block, h, h_in):
        return seg_std(h, block.dst_pos, block.n_dst)


NC_OPS = {
    "pre_mult": lambda d: PreMult(),
    "pre_sub": lambda d: PreSub(),
    "pre_add": lambda d: PreAdd(),
    "f_zero": lambda d: FZero(),
    "f_identity": lambda d: FIdentity(),
    "f_dense": lambda d: FDense(d),
    "f_sparse": lambda d: FSparse(d),
    "f_dense_last": lambda d: FDenseLast(d),
    "f_sparse_last": lambda d: FSparseLast(d),
    "a_max": lambda d: NCOpAMax(d),
    "a_mean": lambda d: NCOpAMean(d),
    "a_sum": lambda d: NCOpASum(d),
    "a_std": lambda d: NCOpAStd(d),
}


class NCOpModule(nn.Module):
    """model.py:10-28: op -> Linear -> (BN if op_norm) -> ReLU."""

    def __init__(self, d, op_name, op_norm=True):
        super().__init__()
        self.op = NC_OPS[op_name](d)
        self.op_norm = op_norm
        self.linear = nn.Linear(d, d, bias=True)
        self.batchnorm_h = nn.BatchNorm1d(d)

    def forward(self, g, h, h_in):
        h = self.op(g, h, h_in)
        h = self.linear(h)
        if self.op_norm:
            h = self.batchnorm_h(h)
        return torch.relu(h)


class NCCell(nn.Module):
    """model.py:31-67."""

    def __init__(self, d, genotype, op_norm=True):
        super().__init__()
        self._nb_nodes = len({gene[1] for gene in genotype.alpha_cell})
        self._concat = list(genotype.concat_node) or list(range(1, 1 + self._nb_nodes))
        self.batchnorm_h = nn.BatchNorm1d(d)
        self._ops = nn.ModuleList(
            [nn.ModuleList([nn.ModuleList() for _ in range(n)]) for n in range(1, 1 + self._nb_nodes)]
        )
        for op_name, center, pre in genotype.alpha_cell:
            self._ops[center - 1][pre].append(NCOpModule(d, op_name, op_norm))
        self.concat = nn.Linear(len(self._concat) * d, d)

    def forward(self, g, src_emb, hr):
        zero_out = self._ops[0][0][0](g, src_emb, hr)
        states = [src_emb, zero_out]
        for n in range(1, self._nb_nodes):
            hs = []
            for i in range(n + 1):
                if len(self._ops[n][i]) > 0:
                    hs.append(self._ops[n][i][0](g, states[i], zero_out))
            states.append(sum(hs))
        states = [states[idx] for idx in self._concat]
        h = self.concat(torch.cat(states, dim=1))
        h = self.batchnorm_h(h)
        return torch.relu(h)


class MLPClassifierOracle(nn.Module):
    """model.py:70-85."""

    def __init__(self, input_dim, output_dim, L=2):
        super().__init__()
        layers = [
            nn.Linear(input_dim // 2 ** l, input_dim // 2 ** (l + 1), bias=True)
            for l in range(L)
        ]
        layers.append(nn.Linear(input_dim // 2 ** L, output_dim, bias=True))
        self.FC_layers = nn.ModuleList(layers)
        self.L = L

    def forward(self, x):
        y = x
        for l in range(self.L):
            y = F.relu(self.FC_layers[l](y))
        return self.FC_layers[self.L](y)


class NCNetworkOracle(nn.Module):
    """model.py:107-189. Blocks come from build_nc_blocks; the src->prev-dst
    position remap (model.py:175-179's O(N*E) loop) is a dict lookup with
    identical semantics."""

    def __init__(self, genotypes, num_nodes, num_classes, num_rels, d, init_dim, num_base_r, op_norm=True):
        super().__init__()
        self.embedding_h = nn.Embedding(num_nodes, init_dim)
        self.embedding_e = nn.Embedding(num_base_r, init_dim)
        self.rel_wt = nn.Parameter(torch.zeros(num_rels, num_base_r))
        self.embedding_h_init = nn.Linear(init_dim, d, bias=False)
        self.embedding_e_init = nn.Linear(init_dim, d, bias=False)
        self.cells = nn.ModuleList([NCCell(d, g, op_norm) for g in genotypes])
        self.classifier = MLPClassifierOracle(d, num_classes)
        self.batchnorm_h = nn.BatchNorm1d(d)

    def forward(self, blocks):
        node_embed = None
        trace = []
        for i, cell in enumerate(self.cells):
            block = blocks[i]
            src_gid = torch.tensor(block.src)
            if i == 0:
                src_embed = self.embedding_h_init(self.embedding_h(src_gid))
            else:
                prev = blocks[i - 1]
                pos = {int(v): p for p, v in enumerate(prev.dst_nodes)}
                src_pos = torch.tensor([pos[int(v)] for v in block.src])
                src_embed = node_embed[src_pos]
            edges_embed = self.embedding_e_init(
                self.rel_wt[block.etype] @ self.embedding_e.weight
            )
            node_embed = cell(block, src_embed, edges_embed)
            trace.append(node_embed)
        h = torch.relu(self.batchnorm_h(node_embed))
        return self.classifier(h), trace


# ---------------------------------------------------------------------------
# NC supernet (models/cell.py + model_search.py)
# ---------------------------------------------------------------------------

NC_PRE_OPS = ["pre_mult", "pre_sub", "pre_add"]
NC_FIRST_OPS = ["f_zero", "f_identity", "f_dense", "f_sparse"]
NC_MIDDLE_OPS = ["a_max", "a_sum", "a_mean"]
NC_LAST_OPS = ["f_zero", "f_identity", "f_dense_last", "f_sparse_last"]


class NCMixedOp(nn.Module):
    """cell.py:11-31: per-op [op, Linear(d,d), BN, ReLU], weighted sum."""

    def __init__(self, d, op_names):
        super().__init__()
        self.op_names = list(op_names)
        self.ops = nn.ModuleList([NC_OPS[n](d) for n in op_names])
        self.linears = nn.ModuleList([nn.Linear(d, d, bias=True) for _ in op_names])
        self.bns = nn.ModuleList([nn.BatchNorm1d(d) for _ in op_names])

    def forward(self, weights, g, h, h_in):
        out = 0
        for w, op, lin, bn in zip(weights, self.ops, self.linears, self.bns):
            out = out + w * torch.relu(bn(lin(op(g, h, h_in))))
        return out


class NCSupernetCell(nn.Module):
    """cell.py:117-146 incl. the in-cell concat -> BN -> ReLU."""

    def __init__(self, d, first_nodes, last_nodes):
        super().__init__()
        self.first_nodes = first_nodes
        self.last_nodes = last_nodes
        self.zero = NCMixedOp(d, NC_PRE_OPS)
        self.first = nn.ModuleList()
        for i in range(first_nodes):
            for _ in range(i + 1):
                self.first.append(NCMixedOp(d, NC_FIRST_OPS))
        self.middle = nn.ModuleList(
            [NCMixedOp(d, NC_MIDDLE_OPS) for _ in range(first_nodes)]
        )
        self.last = nn.ModuleList()
        for i in range(last_nodes):
            for _ in range(first_nodes + i):
                self.last.append(NCMixedOp(d, NC_LAST_OPS))
        self.concat_weights = nn.Linear((first_nodes + last_nodes) * d, d)
        self.batchnorm_h = nn.BatchNorm1d(d)

    def forward(self, g, src_emb, hr, wz, wf, wm, wl):
        h_in = self.zero(wz[0], g, src_emb, hr)
        states = [h_in]
        offset = 0
        for _ in range(self.first_nodes):
            s = sum(
                self.first[offset + j](wf[offset + j], g, h, h_in)
                for j, h in enumerate(states)
            )
            offset += len(states)
            states.append(s)
        states = states[1:]
        states = [
            self.middle[i](wm[i], g, states[i], h_in)
            for i in range(self.first_nodes)
        ]
        offset = 0
        for _ in range(self.last_nodes):
            s = sum(
                self.last[offset + j](wl[offset + j], g, h, h_in)
                for j, h in enumerate(states)
            )
            offset += len(states)
            states.append(s)
        h = self.concat_weights(torch.cat(states, dim=1))
        return torch.relu(self.batchnorm_h(h))


class NCSupernetOracle(nn.Module):
    """model_search.py:52-189 over build_nc_blocks blocks (dropout 0)."""

    def __init__(self, num_nodes, num_classes, num_rels, layers, first_nodes, last_nodes, d, init_dim, num_base_r):
        super().__init__()
        self.embedding_h = nn.Embedding(num_nodes, init_dim)
        self.embedding_e = nn.Embedding(num_base_r, init_dim)
        self.rel_wt = nn.Parameter(torch.zeros(num_rels, num_base_r))
        self.embedding_h_init = nn.Linear(init_dim, d, bias=False)
        self.embedding_e_init = nn.Linear(init_dim, d, bias=False)
        self.cells = nn.ModuleList(
            [NCSupernetCell(d, first_nodes, last_nodes) for _ in range(layers)]
        )
        self.classifier = MLPClassifierOracle(d, num_classes)
        self.batchnorm_h = nn.BatchNorm1d(d)

    def forward(self, blocks, layer_weights):
        node_embed = None
        for i, cell in enumerate(self.cells):
            block = blocks[i]
            src_gid = torch.tensor(block.src)
            if i == 0:
                src_embed = self.embedding_h_init(self.embedding_h(src_gid))
            else:
                prev = blocks[i - 1]
                pos = {int(v): p for p, v in enumerate(prev.dst_nodes)}
                src_pos = torch.tensor([pos[int(v)] for v in block.src])
                src_embed = node_embed[src_pos]
            edges_embed = self.embedding_e_init(
                self.rel_wt[block.etype] @ self.embedding_e.weight
            )
            wz, wf, wm, wl = layer_weights[i]
            node_embed = cell(block, src_embed, edges_embed, wz, wf, wm, wl)
        h = torch.relu(self.batchnorm_h(node_embed))
        return self.classifier(h)


# ---------------------------------------------------------------------------
# weight transplant: flax '/'-flattened params -> torch modules
# ---------------------------------------------------------------------------


class Transplant:
    """Copies arrays out of a flax variables dict, tracking consumption."""

    def __init__(self, variables):
        import flax.traverse_util as tu

        self.params = {
            k: np.asarray(v)
            for k, v in tu.flatten_dict(variables["params"], sep="/").items()
        }
        self.stats = {
            k: np.asarray(v)
            for k, v in tu.flatten_dict(
                variables.get("batch_stats", {}), sep="/"
            ).items()
        }
        self.used_p: set[str] = set()
        self.used_s: set[str] = set()

    def take(self, key):
        self.used_p.add(key)
        return torch.tensor(self.params[key])

    def take_stat(self, key):
        self.used_s.add(key)
        return torch.tensor(self.stats[key])

    def linear(self, mod: nn.Linear, prefix: str):
        with torch.no_grad():
            mod.weight.copy_(self.take(f"{prefix}/kernel").T)
            if mod.bias is not None:
                mod.bias.copy_(self.take(f"{prefix}/bias"))

    def bn(self, mod: nn.BatchNorm1d, prefix: str):
        with torch.no_grad():
            mod.weight.copy_(self.take(f"{prefix}/scale"))
            mod.bias.copy_(self.take(f"{prefix}/bias"))
            mod.running_mean.copy_(self.take_stat(f"{prefix}/mean"))
            mod.running_var.copy_(self.take_stat(f"{prefix}/var"))

    def tensor(self, param: nn.Parameter, key: str):
        with torch.no_grad():
            param.copy_(self.take(key))

    def assert_exhausted(self, ignore=()):
        left_p = {
            k for k in self.params if k not in self.used_p
            and not any(k.startswith(pre) for pre in ignore)
        }
        left_s = {
            k for k in self.stats if k not in self.used_s
            and not any(k.startswith(pre) for pre in ignore)
        }
        assert not left_p, f"unmapped flax params: {sorted(left_p)}"
        assert not left_s, f"unmapped flax batch_stats: {sorted(left_s)}"


# flax auto-names for the inner op module of the compiled OpModule
_FLAX_OP_CLASS = {
    "pre_mult": None,
    "pre_sub": None,
    "pre_add": None,
    "pre_corr": None,
    "f_zero": None,
    "f_identity": None,
    "f_dense": "FDense_0",
    "f_sparse": "FSparse_0",
    "f_dense_comp": "FDenseComp_0",
    "f_sparse_comp": "FSparseComp_0",
    "f_comp": "FComp_0",
    "f_dense_last": "FDenseLast_0",
    "f_sparse_last": "FSparseLast_0",
    "a_max": "AMaxLP_0",
    "a_mean": "AMeanLP_0",
    "a_sum": "ASumLP_0",
}
_FLAX_NC_OP_CLASS = {
    **_FLAX_OP_CLASS,
    "a_max": "AMaxNC_0",
    "a_mean": "AMeanNC_0",
    "a_sum": "ASumNC_0",
    "a_std": "AStdNC_0",
}


def _copy_lp_op(tp: Transplant, op: nn.Module, op_name: str, prefix: str, class_map=None):
    """Copy one op's inner weights from flax path ``prefix``."""
    cls = (class_map or _FLAX_OP_CLASS)[op_name]
    if cls is None:
        return
    base = f"{prefix}/{cls}"
    if op_name in ("f_dense", "f_dense_last"):
        tp.linear(op.W, f"{base}/Dense_0")
    elif op_name in ("f_sparse", "f_sparse_last"):
        tp.linear(op.W, f"{base}/W")
        tp.linear(op.a, f"{base}/a")
    elif op_name in ("f_sparse_comp", "f_dense_comp"):
        g = f"{base}/g"
        tp.linear(op.W_in, f"{g}/W_in")
        tp.linear(op.W_out, f"{g}/W_out")
        tp.linear(op.W_self, f"{g}/W_self")
        if op_name == "f_sparse_comp":
            tp.linear(op.a_in, f"{g}/a_in")
            tp.linear(op.a_out, f"{g}/a_out")
            tp.linear(op.a_self, f"{g}/a_self")
    elif op_name == "f_comp":
        tp.linear(op.W_in, f"{base}/W_in")
        tp.linear(op.W_out, f"{base}/W_out")
        tp.linear(op.W_self, f"{base}/W_self")
    elif op_name in ("a_max", "a_mean"):
        tp.linear(op.linear, f"{base}/Dense_0")
    elif op_name == "a_sum":
        pass


def load_lp_network_from_flax(oracle: LPNetworkOracle, variables, genotypes):
    """Transplant mr_gnas_tpu.models.LPNetwork variables into the oracle."""
    tp = Transplant(variables)
    tp.tensor(oracle.embedding_h.weight, "emb/embedding_h")
    tp.tensor(oracle.embedding_e.weight, "emb/embedding_e")
    tp.tensor(oracle.rel_wt, "emb/rel_wt")
    tp.linear(oracle.linear_e, "emb/linear_e")
    tp.tensor(oracle.w_rel, "w_rel")
    for i, (cell, geno) in enumerate(zip(oracle.cells, genotypes)):
        cp = f"cell_{i}"
        for op_name, center, pre in geno.alpha_cell:
            mod = cell._ops[center - 1][pre][0]
            opfx = f"{cp}/op_{center}_{pre}"
            _copy_lp_op(tp, mod.op, op_name, opfx)
            if op_name != "pre_mult":
                tp.bn(mod.batchnorm_h, f"{opfx}/bn")
        tp.linear(cell.concat, f"{cp}/concat")
        tp.bn(cell.batchnorm_h, f"{cp}/bn_out")
    tp.assert_exhausted()
    return tp


def load_nc_network_from_flax(oracle: NCNetworkOracle, variables, genotypes):
    """Transplant mr_gnas_tpu.models.NCNetwork variables into the NC oracle."""
    tp = Transplant(variables)
    tp.tensor(oracle.embedding_h.weight, "emb/embedding_h")
    tp.tensor(oracle.embedding_e.weight, "emb/embedding_e")
    tp.tensor(oracle.rel_wt, "emb/rel_wt")
    tp.linear(oracle.embedding_h_init, "emb/h_init")
    tp.linear(oracle.embedding_e_init, "emb/e_init")
    tp.bn(oracle.batchnorm_h, "bn_h")
    for l in range(3):
        tp.linear(oracle.classifier.FC_layers[l], f"classifier/Dense_{l}")
    for i, (cell, geno) in enumerate(zip(oracle.cells, genotypes)):
        cp = f"cell_{i}"
        for op_name, center, pre in geno.alpha_cell:
            mod = cell._ops[center - 1][pre][0]
            opfx = f"{cp}/op_{center}_{pre}"
            _copy_lp_op(tp, mod.op, op_name, opfx, class_map=_FLAX_NC_OP_CLASS)
            tp.linear(mod.linear, f"{opfx}/linear")
            if mod.op_norm:
                tp.bn(mod.batchnorm_h, f"{opfx}/bn")
        tp.linear(cell.concat, f"{cp}/concat")
        tp.bn(cell.batchnorm_h, f"{cp}/bn_out")
    tp.assert_exhausted()
    return tp


def _copy_lp_mixed(tp: Transplant, mixed: LPMixedOp, prefix: str):
    for name, op, bn in zip(mixed.op_names, mixed.ops, mixed.bns):
        _copy_lp_op(tp, op, name, prefix)
        tp.bn(bn, f"{prefix}/bn_{name}")


def _copy_nc_mixed(tp: Transplant, mixed: NCMixedOp, prefix: str):
    for name, op, lin, bn in zip(mixed.op_names, mixed.ops, mixed.linears, mixed.bns):
        _copy_lp_op(tp, op, name, prefix, class_map=_FLAX_NC_OP_CLASS)
        tp.linear(lin, f"{prefix}/lin_{name}")
        tp.bn(bn, f"{prefix}/bn_{name}")


def load_nc_supernet_from_flax(oracle: NCSupernetOracle, variables):
    """Transplant mr_gnas_tpu.models.NCSupernet (fused=False) variables."""
    tp = Transplant(variables)
    tp.tensor(oracle.embedding_h.weight, "emb/embedding_h")
    tp.tensor(oracle.embedding_e.weight, "emb/embedding_e")
    tp.tensor(oracle.rel_wt, "emb/rel_wt")
    tp.linear(oracle.embedding_h_init, "emb/h_init")
    tp.linear(oracle.embedding_e_init, "emb/e_init")
    tp.bn(oracle.batchnorm_h, "bn_h")
    for l in range(3):
        tp.linear(oracle.classifier.FC_layers[l], f"classifier/Dense_{l}")
    for i, cell in enumerate(oracle.cells):
        cp = f"cell_{i}"
        _copy_nc_mixed(tp, cell.zero, f"{cp}/zero_0")
        for k, m in enumerate(cell.first):
            _copy_nc_mixed(tp, m, f"{cp}/first_{k}")
        for k, m in enumerate(cell.middle):
            _copy_nc_mixed(tp, m, f"{cp}/middle_{k}")
        for k, m in enumerate(cell.last):
            _copy_nc_mixed(tp, m, f"{cp}/last_{k}")
        tp.linear(cell.concat_weights, f"{cp}/concat")
        tp.bn(cell.batchnorm_h, f"{cp}/bn_out")
    tp.assert_exhausted()
    return tp


def load_lp_supernet_from_flax(oracle: LPSupernetOracle, variables):
    """Transplant mr_gnas_tpu.models.LPSupernet (fused=False naming)
    variables into the supernet oracle."""
    tp = Transplant(variables)
    tp.tensor(oracle.embedding_h.weight, "emb/embedding_h")
    tp.tensor(oracle.embedding_e.weight, "emb/embedding_e")
    tp.tensor(oracle.rel_wt, "emb/rel_wt")
    tp.linear(oracle.linear_e, "emb/linear_e")
    tp.tensor(oracle.w_rel, "w_rel")
    tp.bn(oracle.batchnorm_h, "bn_h")
    for i, cell in enumerate(oracle.cells):
        cp = f"cell_{i}"
        _copy_lp_mixed(tp, cell.zero, f"{cp}/zero_0")
        for k, m in enumerate(cell.first):
            _copy_lp_mixed(tp, m, f"{cp}/first_{k}")
        for k, m in enumerate(cell.middle):
            _copy_lp_mixed(tp, m, f"{cp}/middle_{k}")
        for k, m in enumerate(cell.last):
            _copy_lp_mixed(tp, m, f"{cp}/last_{k}")
        tp.linear(cell.concat_weights, f"{cp}/concat")
    tp.assert_exhausted()
    return tp
