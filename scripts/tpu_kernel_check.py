"""Compiled (non-interpret) Pallas kernel parity checks on the real TPU.

The pytest suite runs every Pallas kernel in interpret mode on a virtual
CPU mesh (tests/conftest.py forces the cpu platform); this script is the
on-hardware complement: it compiles the kernels through Mosaic on the
actual TPU and asserts the same parity contracts against the XLA
baselines. Run manually whenever a kernel changes:

    python scripts/tpu_kernel_check.py

Exit 0 iff every check passes. Covers:
  * blocked-CSR segment sum/max/mean, forward + gather-formulated VJP
    (kernels/pallas_segment.py) vs kernels/segment.py XLA scatters;
  * the MXU one-hot small-table gather backward (kernels/table.py) vs
    jnp.take's scatter-add VJP;
  * the BN-mix stage mega-kernel through a full LPSupernet training
    step: megakernel=True vs False — loss, parameter grads, batch_stats
    (kernels/bn_mix.py, custom VJP).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _require_tpu():
    import jax

    if jax.default_backend() != "tpu":
        print(f"SKIP: default backend is {jax.default_backend()!r}, not tpu")
        sys.exit(0)
    from bench import _enable_compile_cache

    _enable_compile_cache()  # repeat checks pay only device time


def check_segment_csr() -> None:
    import jax
    import jax.numpy as jnp

    from mr_gnas_tpu.kernels.pallas_segment import (
        CSRMeta,
        build_blocked_csr,
        segment_max_csr,
        segment_mean_csr,
        segment_sum_csr,
    )
    from mr_gnas_tpu.kernels.segment import segment_max, segment_mean, segment_sum

    rng = np.random.default_rng(0)
    e, n, d = 4096, 1024, 128
    # skewed dst (hub nodes) + masked tail, like a sampled KG batch
    dst = np.minimum(
        (rng.pareto(1.2, size=e) * 40).astype(np.int32), n - 1
    )
    mask = (rng.random(e) > 0.1).astype(np.float32)
    data = rng.normal(size=(e, d)).astype(np.float32)
    meta = CSRMeta.from_blocked(build_blocked_csr(dst, n, mask))
    dstj, mj, xj = jnp.asarray(dst), jnp.asarray(mask), jnp.asarray(data)
    g_out = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    cases = {
        "sum": (
            lambda x: segment_sum_csr(x, meta, dstj, mj, interpret=False),
            lambda x: segment_sum(x, dstj, n, mj),
        ),
        "max": (
            lambda x: segment_max_csr(x, meta, dstj, mj, interpret=False),
            lambda x: segment_max(x, dstj, n, mj),
        ),
        "mean": (
            lambda x: segment_mean_csr(x, meta, dstj, mj, interpret=False),
            lambda x: segment_mean(x, dstj, n, mj),
        ),
    }
    for name, (pallas_fn, xla_fn) in cases.items():
        got, gotg = jax.jit(
            lambda x: jax.value_and_grad(
                lambda y: jnp.sum(pallas_fn(y) * g_out)
            )(x)
        )(xj)
        want, wantg = jax.jit(
            lambda x: jax.value_and_grad(lambda y: jnp.sum(xla_fn(y) * g_out))(x)
        )(xj)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gotg, wantg, rtol=1e-5, atol=1e-5)
        print(f"ok segment_{name}_csr compiled fwd+grad")


def check_table_kernel() -> None:
    import jax
    import jax.numpy as jnp

    from mr_gnas_tpu.kernels.table import take_small_table

    rng = np.random.default_rng(1)
    n, r, d = 475, 9000, 200
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=r).astype(np.int32))
    g_out = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))

    got = jax.jit(
        jax.grad(lambda t: jnp.sum(take_small_table(t, idx, interpret=False) * g_out))
    )(table)
    want = jax.jit(
        jax.grad(lambda t: jnp.sum(jnp.take(t, idx, axis=0) * g_out))
    )(table)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    print("ok take_small_table compiled MXU backward")


def check_megakernel_step() -> None:
    import jax
    import jax.numpy as jnp

    from mr_gnas_tpu.cells import CellSpec, init_alphas
    from mr_gnas_tpu.data import (
        generate_sampled_graph_and_labels,
        get_adj_and_degrees,
        synthetic_kg,
    )
    from mr_gnas_tpu.graph.build import round_up
    from mr_gnas_tpu.models import LPSupernet, lp_search_loss

    rng = np.random.default_rng(2)
    kg = synthetic_kg(num_ent=512, num_rels=11, n_train=2048, seed=0)
    adj, deg = get_adj_and_degrees(kg.num_ent, kg.train)
    batch = generate_sampled_graph_and_labels(
        kg.train, 512, 0.5, kg.num_rels, adj, deg, 4, "uniform", rng,
        n_nodes_pad=round_up(min(1024, kg.num_ent), 128),
    )
    spec = CellSpec(task="lp")

    def build(mega):
        return LPSupernet(
            num_ent=kg.num_ent, num_rels=kg.num_rels, layers=2, spec=spec,
            feature_dim=64, init_fea_dim=32, num_base_r=23,
            dropout_cell=0.0, drop_aggr=0.0, megakernel=mega,
        )

    alphas = init_alphas(jax.random.key(0), spec, 2, with_final=True)
    v = build(False).init(jax.random.key(1), batch.graph, alphas, False)
    params, bstats = v["params"], v["batch_stats"]
    trip, lab = jnp.asarray(batch.triplets), jnp.asarray(batch.labels)

    def make_step(mega):
        model = build(mega)

        @jax.jit
        def step(p):
            def loss_fn(p):
                (ent, rel), mut = model.apply(
                    {"params": p, "batch_stats": bstats}, batch.graph, alphas,
                    True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(5)},
                )
                return lp_search_loss(ent, rel, trip, lab), mut["batch_stats"]

            (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            return l, bs, g

        return step

    l1, bs1, g1 = make_step(True)(params)

    def _rel_l2(tree0, tree1, tol, what, abs_floor=1e-6):
        # Per-leaf contract: ||a-b|| < tol * ||b|| + abs_floor. The
        # absolute floor covers near-zero gradient directions (e.g. a BN
        # bias right before another normalization makes the loss
        # ~invariant: |g| ~ 1e-3-1e-6 while every real leaf is O(1e-1+)),
        # whose "relative" error is noise divided by itself — the same
        # pathology fixed in tests/test_spmd.py round 4. The default
        # floor is 4+ orders below the real-leaf signal, so it can't
        # mask wiring bugs; callers with cancellation-prone reduction
        # leaves pass the measured drift class explicitly.
        leaves0 = sorted(
            jax.tree_util.tree_leaves_with_path(tree0), key=lambda x: str(x[0])
        )
        leaves1 = sorted(
            jax.tree_util.tree_leaves_with_path(tree1), key=lambda x: str(x[0])
        )
        assert len(leaves0) == len(leaves1), (
            f"{what}: leaf count mismatch {len(leaves0)} != {len(leaves1)}"
        )
        for (k0, v0), (k1, v1) in zip(leaves0, leaves1):
            assert str(k0) == str(k1), f"{what}: key mismatch {k0} != {k1}"
            num = float(jnp.linalg.norm((v0 - v1).ravel()))
            den = float(jnp.linalg.norm(v1.ravel()))
            assert np.isfinite(num), f"{what}{jax.tree_util.keystr(k0)}: non-finite"
            assert num < tol * den + abs_floor, (
                f"{what}{jax.tree_util.keystr(k0)}: ||diff|| {num:.2e} >= "
                f"{tol} * ||ref|| {den:.2e} + {abs_floor}"
            )
            # aggregate rel-L2 can hide a localized wiring bug confined to
            # a small slice of a large tensor: also cap the worst element
            # at 10x the rel-L2 bound (scales with the contract tightness)
            cap = 10.0 * tol
            max_err = float(jnp.max(jnp.abs(v0 - v1)))
            max_ref = float(jnp.max(jnp.abs(v1)))
            assert max_err < cap * max_ref + abs_floor, (
                f"{what}{jax.tree_util.keystr(k0)}: max elem err {max_err:.2e} "
                f">= {cap:g} * max |ref| {max_ref:.2e} + {abs_floor}"
            )

    print(f"ok megakernel LPSupernet step compiled (loss {float(l1):.5f})")

    # --- same-compile wiring parity (compiler-drift-robust, TIGHT) ---
    # The tight invariant at the model's production precision is the SAME
    # mega kernels compiled through Mosaic vs interpret-lowered to XLA
    # ops, in this session, on these inputs: any Mosaic lowering /
    # pipeline-buffer bug shows here at 1e-5 scale.
    def _interpret_step(p):
        os.environ["MR_GNAS_PALLAS_INTERPRET"] = "1"
        try:
            return make_step(True)(p)
        finally:
            del os.environ["MR_GNAS_PALLAS_INTERPRET"]

    li, bsi, gi = _interpret_step(params)
    np.testing.assert_allclose(float(l1), float(li), rtol=1e-5)
    _rel_l2(bs1, bsi, 1e-4, "batch_stats[mosaic-vs-interpret]")
    # Gradient parity needs a BOUNDARY-FREE configuration: with natural
    # params, any row whose pre-ReLU y = op*a+b sits within one rounding
    # of 0 lands on different sides under Mosaic's fma order vs the
    # interpret-lowered XLA order, toggling its ENTIRE dy term —
    # measured this session as ~4e-4 ABSOLUTE jumps on S1/bias leaves
    # (4.6e-4 at ||ref||=1.26, 3.9e-4 at ||ref||=0.30) cascading into
    # downstream matmul grads (1.6e-2 on concat.kernel). That is a
    # property of ReLU at the boundary, not of the kernel wiring. The
    # TIGHT gradient contract therefore runs with every bias leaf
    # shifted +4: BN emits xhat ~ N(0,1), so y ~ N(4, 1) and no unit of
    # the ~2.5M sits within rounding of 0 — same program, same wiring,
    # every relu_mask still computed, and a wiring bug still shows at
    # O(||leaf||).
    def _shift_biases(tree):
        return {
            k: (_shift_biases(v) if isinstance(v, dict)
                else (v + 4.0 if "bias" in k.lower() else v))
            for k, v in tree.items()
        }

    p_shift = _shift_biases(params)
    l1s, bs1s, g1s = make_step(True)(p_shift)
    lis, bsis, gis = _interpret_step(p_shift)
    # the shifted loss is ~40x larger (relu all-linear), so its f32
    # accumulation noise scales with it — 1e-4 sanity bound here; the
    # wiring contract is the per-leaf grad check below
    np.testing.assert_allclose(float(l1s), float(lis), rtol=1e-4)
    _rel_l2(bs1s, bsis, 1e-4, "batch_stats[mosaic-vs-interpret,shifted]")
    _rel_l2(g1s, gis, 1e-4, "grads[mosaic-vs-interpret,shifted]")
    print("ok megakernel Mosaic-vs-interpret same-compile parity "
          "(loss 1e-5 + stats 1e-4 natural; grads 1e-4 boundary-free)")

    # --- cross-schedule contract (slab vs mega), exact-matmul mode ---
    # At default precision, f32 matmuls run at reduced MXU mantissa and
    # XLA reassociates the slab reductions differently across compiler
    # releases, so slab-vs-mega mutual rounding drifts with XLA versions
    # (the round-2/3 tolerance-fragility item: a guessed 2e-2 bound was
    # overrun at 2.48e-2). Under jax.default_matmul_precision('highest')
    # both schedules compute exact f32 matmuls (the Pallas kernels
    # already pin Precision.HIGHEST internally), leaving only f32 sum
    # reassociation — bounded at 1e-3 per leaf with margin, two orders
    # tighter than any wiring bug.
    with jax.default_matmul_precision("highest"):
        l0h, bs0h, g0h = make_step(False)(params)
        l1h, bs1h, g1h = make_step(True)(params)
    np.testing.assert_allclose(float(l0h), float(l1h), rtol=1e-4)
    _rel_l2(bs0h, bs1h, 1e-3, "batch_stats[slab-vs-mega@highest]")
    _rel_l2(g0h, g1h, 1e-3, "grads[slab-vs-mega@highest]")
    print("ok megakernel-vs-slab cross-schedule parity @highest (<=1e-3)")


def check_static_padded_csr() -> None:
    """pad_blocked_csr no-op chunks compiled on TPU: values must equal
    the unpadded CSR exactly. Catches the output-revisit hazard (dummy
    chunks must extend the LAST block's consecutive run — a dummy chunk
    revisiting an earlier, already-flushed out block reads a stale
    buffer and clobbers it; interpret mode cannot catch this)."""
    import jax
    import jax.numpy as jnp

    from mr_gnas_tpu.kernels.fused_agg import fused_middle_agg
    from mr_gnas_tpu.kernels.pallas_segment import (
        CSRMeta,
        build_blocked_csr,
        pad_blocked_csr,
    )

    rng = np.random.default_rng(0)
    e, n, d = 65536, 14592, 200
    dst = rng.integers(0, 14541, size=e).astype(np.int32)
    maskv = np.ones(e, np.float32)
    xj = jnp.asarray(rng.normal(size=(e, d)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(d, d)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(d, d)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=d) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=d) * 0.1, jnp.float32)
    base = build_blocked_csr(dst, n, maskv, bn=128, rb=512)
    nb = -(-n // 128)
    padded = pad_blocked_csr(base, nb + -(-e // 512), e + nb * 512 + 512)
    dstj, mj = jnp.asarray(dst), jnp.asarray(maskv)

    def run(meta):
        f = jax.jit(lambda *a: fused_middle_agg(*a, meta, dstj, mj))
        return [np.asarray(o).astype(np.float32) for o in f(xj, w1, b1, w2, b2)]

    ob = run(CSRMeta.from_blocked(base))
    op = run(CSRMeta.from_blocked(padded))
    for a, b in zip(ob, op):
        np.testing.assert_array_equal(a, b)
    print("ok static-padded CSR compiled (no-op chunks identity)")


def main() -> None:
    _require_tpu()
    check_segment_csr()
    check_table_kernel()
    check_megakernel_step()
    check_static_padded_csr()
    print("ALL TPU KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
