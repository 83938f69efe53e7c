"""Parity anchors against torch (CPU): BatchNorm1d semantics and the
ConvE decoder stack. These pin the two most translation-sensitive pieces
(SURVEY.md §7 hard-part 6: BN train/eval semantics) to the exact
framework the reference uses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mr_gnas_tpu.layers import MaskedBatchNorm
from mr_gnas_tpu.ops.registry import OpArgs, make_score_fn


def test_masked_bn_matches_torch_train_and_eval(rng):
    n, d = 37, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    tbn = torch.nn.BatchNorm1d(d, momentum=0.1, eps=1e-5)
    tbn.train()
    with torch.no_grad():
        want_tr = tbn(torch.tensor(x)).numpy()

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(x), None, True)
    got_tr, mut = bn.apply(
        variables, jnp.asarray(x), None, True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(got_tr), want_tr, rtol=1e-5, atol=1e-5)
    # running stats after one step
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )
    # eval forward with the updated stats
    tbn.eval()
    with torch.no_grad():
        want_ev = tbn(torch.tensor(x)).numpy()
    got_ev = bn.apply(
        {"params": variables["params"], "batch_stats": mut["batch_stats"]},
        jnp.asarray(x), None, False,
    )
    np.testing.assert_allclose(np.asarray(got_ev), want_ev, rtol=1e-4, atol=1e-5)


def test_masked_bn_mask_equals_torch_on_subset(rng):
    """Masked BN over padded rows == torch BN over the unpadded tensor."""
    n, pad, d = 20, 12, 6
    x = rng.normal(size=(n, d)).astype(np.float32)
    x_pad = np.concatenate([x, np.zeros((pad, d), np.float32)])
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])

    tbn = torch.nn.BatchNorm1d(d)
    tbn.train()
    with torch.no_grad():
        want = tbn(torch.tensor(x)).numpy()

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(x_pad), jnp.asarray(mask), True)
    got, mut = bn.apply(
        variables, jnp.asarray(x_pad), jnp.asarray(mask), True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(got)[:n], want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), tbn.running_mean.numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_conve_matches_torch_pipeline(rng):
    """Our ConvE head == a torch replica of operations_lp.py:130-200 with
    identical weights (eval mode)."""
    b, n, d = 4, 10, 32
    k_w, k_h, num_filt, ker_sz = 4, 8, 6, 3
    all_ent = rng.normal(size=(n, d)).astype(np.float32)
    sub = rng.normal(size=(b, d)).astype(np.float32)
    rel = rng.normal(size=(b, d)).astype(np.float32)

    op = make_score_fn(
        "sf_ConvE",
        OpArgs(embed_dim=d, num_filt=num_filt, ker_sz=ker_sz, k_w=k_w, k_h=k_h),
    )
    variables = op.init(
        jax.random.key(0), jnp.asarray(all_ent), jnp.asarray(sub), jnp.asarray(rel), False
    )
    got = np.asarray(
        op.apply(variables, jnp.asarray(all_ent), jnp.asarray(sub), jnp.asarray(rel), False)
    )

    # torch replica with the same weights
    p = variables["params"]
    conv_w = np.transpose(np.asarray(p["conv"]["kernel"]), (3, 2, 0, 1))  # HWIO->OIHW
    tconv = torch.nn.Conv2d(1, num_filt, (ker_sz, ker_sz), bias=True)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(conv_w))
        tconv.bias.copy_(torch.tensor(np.asarray(p["conv"]["bias"])))
    flat_sz = (2 * k_h - ker_sz + 1) * (k_w - ker_sz + 1) * num_filt
    tfc = torch.nn.Linear(flat_sz, d)

    stack = np.concatenate(
        [sub.reshape(b, 1, d), rel.reshape(b, 1, d)], axis=1
    ).reshape(b, 1, 2 * k_h, k_w)
    with torch.no_grad():
        x = torch.tensor(stack)
        # bn0/bn1/bn2 are identity in eval with fresh stats (scale 1, bias 0)
        x = tconv(x)
        x = torch.relu(x)
        # channel-last flatten to match NHWC: [B,C,H,W] -> [B,H,W,C]
        x = x.permute(0, 2, 3, 1).reshape(b, -1)
        fc_w = torch.tensor(np.asarray(p["fc"]["kernel"]))  # [flat, d]
        fc_b = torch.tensor(np.asarray(p["fc"]["bias"]))
        x = x @ fc_w + fc_b
        x = torch.relu(x)
        x = x @ torch.tensor(all_ent).T
        want = torch.sigmoid(x).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
