"""Link-prediction score functions (1-vs-N decoders).

Re-designs the reference's decoders (models/operations_lp.py:101-200) as
flax modules scoring a batch of (subject, relation) queries against all
entities: ``score(all_ent [N,D], sub_emb [B,D], rel_emb [B,D]) -> [B,N]``.

The DistMult/ConvE heads are single MXU-friendly [B,D]x[D,N] matmuls; the
TransE head (L1 distance, not matmul-decomposable) is chunked over the
batch with ``lax.map`` to bound the [b,N,D] broadcast.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mr_gnas_tpu.ops.message_ops import dense


class SfTransE(nn.Module):
    """sigmoid(gamma - || (s + r) - all_ent ||_1) (operations_lp.py:101-112)."""

    gamma: float = 40.0
    chunk: int = 8
    with_sigmoid: bool = True  # False -> raw logits (the saturation-proof
    # BCE-with-logits training path, models/lp.bce_logits_loss)

    @nn.compact
    def __call__(self, all_ent: jax.Array, sub: jax.Array, rel: jax.Array, training: bool = False):
        obj = sub + rel  # [B, D]
        b = obj.shape[0]
        pad = (-b) % self.chunk
        obj_p = jnp.pad(obj, ((0, pad), (0, 0)))

        def score_chunk(q):  # [chunk, D]
            d = jnp.sum(jnp.abs(q[:, None, :] - all_ent[None, :, :]), axis=-1)
            return self.gamma - d

        chunks = obj_p.reshape(-1, self.chunk, obj.shape[-1])
        x = jax.lax.map(score_chunk, chunks).reshape(-1, all_ent.shape[0])[:b]
        return jax.nn.sigmoid(x) if self.with_sigmoid else x


class SfDistMult(nn.Module):
    """sigmoid((s * r) @ all_ent^T) (operations_lp.py:115-127)."""

    with_sigmoid: bool = True  # see SfTransE

    @nn.compact
    def __call__(self, all_ent: jax.Array, sub: jax.Array, rel: jax.Array, training: bool = False):
        x = jnp.dot(sub * rel, all_ent.T, preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(x) if self.with_sigmoid else x


class SfConvE(nn.Module):
    """ConvE decoder (operations_lp.py:130-200).

    Stack (s, r) into a [2*k_h, k_w] image -> BN -> Conv(num_filt, ker_sz)
    -> BN -> relu -> feature-dropout -> FC -> hidden-dropout -> BN -> relu
    -> matmul vs all entities -> sigmoid. NHWC layout for TPU convs.
    """

    embed_dim: int = 200
    num_filt: int = 200
    ker_sz: int = 7
    k_w: int = 10
    k_h: int = 20
    conve_hid_drop: float = 0.3
    feat_drop: float = 0.3
    with_sigmoid: bool = True  # False -> raw logits (CompGCN adds a bias)
    out_bias: bool = False  # per-entity bias added after the matmul —
    # the ORIGINAL ConvE's `b` parameter, which MR-GNAS's variant drops
    # (operations_lp.py:130-200 has no bias). Off by default for
    # reference parity; opt-in because without it the all-zero-logit
    # dying-relu basin (x = relu(bn2(.)) >= 0, logits = x @ E^T) has no
    # escape hatch on small graphs (NOTES round-3 ConvE analysis).

    @nn.compact
    def __call__(self, all_ent: jax.Array, sub: jax.Array, rel: jax.Array, training: bool = False):
        assert self.embed_dim == self.k_h * self.k_w, "embed_dim must equal k_h*k_w"
        b = sub.shape[0]
        # concat along a height-of-2 stack then reshape to [B, 2*k_h, k_w, 1]
        stack = jnp.concatenate(
            [sub.reshape(b, 1, self.embed_dim), rel.reshape(b, 1, self.embed_dim)],
            axis=1,
        ).reshape(b, 2 * self.k_h, self.k_w, 1)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9, name="bn0")(
            stack
        )
        x = nn.Conv(
            features=self.num_filt,
            kernel_size=(self.ker_sz, self.ker_sz),
            strides=1,
            padding="VALID",
            use_bias=True,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9, name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.feat_drop, deterministic=not training)(x)
        x = x.reshape(b, -1)
        x = dense(self.embed_dim, name="fc")(x)
        x = nn.Dropout(self.conve_hid_drop, deterministic=not training)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9, name="bn2")(x)
        x = jax.nn.relu(x)
        x = jnp.dot(x, all_ent.T, preferred_element_type=jnp.float32)
        if self.out_bias:
            x = x + self.param(
                "b", nn.initializers.zeros_init(), (all_ent.shape[0],)
            )
        return jax.nn.sigmoid(x) if self.with_sigmoid else x
