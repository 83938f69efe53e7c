"""Standalone CompGCN baseline (models/compgcn.py:12-269 analog).

The reference ships an unused-but-complete CompGCN + CompGCN-ConvE
baseline; here it is a first-class model over the same padded
:class:`RelGraph` edge-row layout as the NAS stack, so it shares the
segment kernels and sharding story.

Per layer (compgcn.py:48-113):
  comp_h  = phi(h_src, r[etype] * norm) per edge row, phi in {sub, mul,
            ccorr};
  fwd rows -> W_O, inv rows -> W_I, then segment-sum to dst;
  self     = W_S(phi(h, loop_rel));
  n_out    = (self + dropout(agg)) / 3 -> BN -> tanh;
  r_out    = W_R(r) (loop row excluded).

The convenient property of our layout: the self-loop relation id
(2*num_rels) indexes exactly the appended ``loop_rel`` row, so one
concat + one gather covers all three sections.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_gnas_tpu.graph.container import RelGraph
from mr_gnas_tpu.kernels import segment_sum
from mr_gnas_tpu.layers import MaskedBatchNorm, xavier_relu_param
from mr_gnas_tpu.ops.message_ops import dense
from mr_gnas_tpu.ops.score_fns import SfConvE


def _compose(fn: str, a: jax.Array, b: jax.Array) -> jax.Array:
    if fn == "sub":
        return a - b
    if fn == "mul":
        return a * b
    if fn == "ccorr":
        d = a.shape[-1]
        fa = jnp.fft.rfft(a, axis=-1)
        fb = jnp.fft.rfft(b, axis=-1)
        return jnp.fft.irfft(jnp.conj(fa) * fb, n=d, axis=-1)
    raise ValueError("comp_fn must be sub, mul, or ccorr")


class CompGraphConv(nn.Module):
    """One CompGCN layer (compgcn.py:12-113)."""

    out_dim: int
    comp_fn: str = "sub"
    batchnorm: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, graph: RelGraph, n_feats, r_feats, training: bool = False):
        in_dim = n_feats.shape[-1]
        loop_rel = xavier_relu_param(self, "loop_rel", (1, in_dim))
        r_cat = jnp.concatenate([r_feats, loop_rel], axis=0)

        ne, nf = graph.n_edge_rows, graph.n_fwd
        # per-edge-row relation features scaled by the edge norm
        hr = jnp.take(r_cat, graph.etype[:ne], axis=0) * graph.norm[:ne, None]
        h_src = jnp.take(n_feats, graph.src[:ne], axis=0)
        comp_h = _compose(self.comp_fn, h_src, hr)

        w_o = dense(self.out_dim, name="W_O")
        w_i = dense(self.out_dim, name="W_I")
        out_fwd = w_o(comp_h[:nf])
        out_inv = w_i(comp_h[nf:])
        new_comp_h = jnp.concatenate([out_fwd, out_inv], axis=0)

        agg = segment_sum(
            new_comp_h, graph.dst[:ne], graph.n_nodes, graph.edge_mask
        )
        agg = nn.Dropout(self.dropout)(agg, deterministic=not training)

        comp_h_s = _compose(self.comp_fn, n_feats, loop_rel)
        n_out = (dense(self.out_dim, name="W_S")(comp_h_s) + agg) / 3.0
        if self.batchnorm:
            n_out = MaskedBatchNorm(name="bn")(n_out, graph.node_mask, training)
        n_out = jnp.tanh(n_out)
        r_out = dense(self.out_dim, name="W_R")(r_cat)[:-1]
        return n_out, r_out


class CompGCN(nn.Module):
    """CompGCN encoder stack (compgcn.py:116-186)."""

    num_ent: int
    num_rel: int  # total relation vocabulary (fwd + inv)
    num_bases: int = 0
    in_dim: int = 100
    layer_size: tuple[int, ...] = (200,)
    comp_fn: str = "sub"
    batchnorm: bool = True
    dropout: float = 0.1
    layer_dropout: tuple[float, ...] = (0.3,)

    @nn.compact
    def __call__(self, graph: RelGraph, training: bool = False):
        n_feats = xavier_relu_param(self, "n_embds", (self.num_ent, self.in_dim))
        if self.num_bases > 0:
            basis = xavier_relu_param(self, "basis", (self.num_bases, self.in_dim))
            weights = xavier_relu_param(self, "weights", (self.num_rel, self.num_bases))
            r_feats = jnp.dot(weights, basis, preferred_element_type=jnp.float32)
        else:
            r_feats = xavier_relu_param(self, "rel_embds", (self.num_rel, self.in_dim))

        for i, size in enumerate(self.layer_size):
            n_feats, r_feats = CompGraphConv(
                out_dim=size,
                comp_fn=self.comp_fn,
                batchnorm=self.batchnorm,
                dropout=self.dropout,
                name=f"layer_{i}",
            )(graph, n_feats, r_feats, training)
            rate = self.layer_dropout[min(i, len(self.layer_dropout) - 1)]
            n_feats = nn.Dropout(rate)(n_feats, deterministic=not training)
        return n_feats, r_feats


class CompGCNConvE(nn.Module):
    """CompGCN encoder + ConvE 1-vs-N decoder with per-entity bias
    (compgcn.py:189-269)."""

    num_ent: int
    num_rel: int
    num_bases: int = 0
    in_dim: int = 100
    layer_size: tuple[int, ...] = (200,)
    comp_fn: str = "sub"
    num_filt: int = 200
    ker_sz: int = 7
    k_w: int = 10
    k_h: int = 20
    hid_drop: float = 0.3
    feat_drop: float = 0.3
    dropout: float = 0.1
    layer_dropout: tuple[float, ...] = (0.3,)

    @nn.compact
    def __call__(self, graph: RelGraph, sub, rel, training: bool = False):
        encoder = CompGCN(
            num_ent=self.num_ent,
            num_rel=self.num_rel,
            num_bases=self.num_bases,
            in_dim=self.in_dim,
            layer_size=self.layer_size,
            comp_fn=self.comp_fn,
            dropout=self.dropout,
            layer_dropout=self.layer_dropout,
            name="encoder",
        )
        n_feats, r_feats = encoder(graph, training)
        conve = SfConvE(
            embed_dim=self.layer_size[-1],
            num_filt=self.num_filt,
            ker_sz=self.ker_sz,
            k_w=self.k_w,
            k_h=self.k_h,
            conve_hid_drop=self.hid_drop,
            feat_drop=self.feat_drop,
            with_sigmoid=False,
            name="conve",
        )
        sub_emb = jnp.take(n_feats, sub, axis=0)
        rel_emb = jnp.take(r_feats, rel, axis=0)
        logits = conve(n_feats, sub_emb, rel_emb, training)
        # per-entity score bias before the sigmoid (compgcn.py:235,266)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.num_ent,))
        return jax.nn.sigmoid(logits + bias[None, : logits.shape[1]])
