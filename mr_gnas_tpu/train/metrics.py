"""Metrics, logging, and throughput instrumentation.

Replaces the reference's stdlib-logging + tensorboardX setup
(search/mr_lp_search.py:345-351) with run-directory logging plus a JSONL
scalar stream (one line per step/epoch — greppable and plottable without
TensorBoard), and adds the north-star counter the reference lacks:
edges/sec/chip.
"""
from __future__ import annotations

import json
import logging
import os
import time


class AverageMeter:
    """Running average (utils/utils.py:144-159)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class ScalarLogger:
    """Append-only JSONL scalar stream + stdlib logging."""

    def __init__(self, run_dir: str, filename: str = "scalars.jsonl"):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self.path = os.path.join(run_dir, filename)
        self._f = open(self.path, "a")

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time(), **scalars}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


def setup_run_dir(save_dir: str, tag: str) -> str:
    run_dir = os.path.join(save_dir, f"{tag}-{time.strftime('%Y%m%d-%H%M%S')}")
    os.makedirs(run_dir, exist_ok=True)
    return run_dir


def setup_logging(run_dir: str, filename: str = "run.log") -> logging.Logger:
    logger = logging.getLogger("mr_gnas_tpu")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(message)s", datefmt="%m/%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        fh = logging.FileHandler(os.path.join(run_dir, filename))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class Throughput:
    """edges/sec (the north-star metric) with warmup skipping."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.steps = 0
        self.edges = 0
        self.t0 = None

    def step(self, n_edges: int):
        self.steps += 1
        if self.steps == self.warmup:
            self.t0 = time.perf_counter()
            self.edges = 0
        elif self.steps > self.warmup:
            self.edges += n_edges

    @property
    def edges_per_sec(self) -> float:
        if self.t0 is None or self.steps <= self.warmup:
            return 0.0
        dt = time.perf_counter() - self.t0
        return self.edges / max(dt, 1e-9)


class PackedFetch:
    """Fetch a small pytree of device arrays with ONE transfer.

    ``jax.device_get`` on a pytree pulls each leaf in its own RPC round
    trip — through the axon tunnel that costs tens of ms per leaf, and
    the per-epoch genotype-patience decode fetches the 5 alpha tensors
    every epoch (the search drivers' hidden host drag). A jitted
    concatenate packs the leaves into one flat f32 buffer on device;
    the host splits it back. Bit-identical values, one round trip.
    """

    def __init__(self, tree):
        import jax
        import jax.numpy as jnp

        leaves, self._treedef = jax.tree_util.tree_flatten(tree)
        assert all(x.dtype == jnp.float32 for x in leaves), (
            "PackedFetch packs into one f32 buffer; mixed dtypes would "
            "silently promote"
        )
        self._shapes = [x.shape for x in leaves]
        self._pack = jax.jit(
            lambda t: jnp.concatenate(
                [jnp.ravel(x) for x in jax.tree_util.tree_leaves(t)]
            )
        )

    def __call__(self, tree):
        import jax
        import numpy as np

        buf = np.asarray(self._pack(tree))
        out, off = [], 0
        for s in self._shapes:
            n = int(np.prod(s)) if s else 1
            out.append(buf[off : off + n].reshape(s))
            off += n
        return jax.tree_util.tree_unflatten(self._treedef, out)


def prefetched(iterable, prepare, depth: int = 2):
    """Run ``prepare(item)`` for upcoming items on a worker thread.

    The driver loops build + device-transfer each minibatch's arrays
    (for lp-train: a [B, num_ent] multi-hot label block per step)
    serially between device steps; preparing ``depth`` items ahead on a
    thread overlaps host build + host->device transfer with the device's
    current step. ``prepare`` runs in submission order on ONE worker, so
    anything RNG-dependent stays deterministic.
    """
    import collections
    import concurrent.futures

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    try:
        queue = collections.deque()
        it = iter(iterable)
        done = False
        while True:
            while not done and len(queue) < depth:
                try:
                    queue.append(pool.submit(prepare, next(it)))
                except StopIteration:
                    done = True
            if not queue:
                return
            yield queue.popleft().result()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def count_parameters(params) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def calc_time(seconds: float) -> dict:
    """Duration as day/hour/minute/second (utils/utils.py:266-270)."""
    m, s = divmod(seconds, 60)
    h, m = divmod(m, 60)
    d, h = divmod(h, 24)
    return {"day": int(d), "hour": int(h), "minute": int(m), "second": int(s)}


class NonFiniteLossError(RuntimeError):
    """Raised when a driver's finite-check trips (SURVEY §5 sanitizers)."""


def guard_finite(loss, epoch: int, log=None, save_fn=None) -> None:
    """Abort a diverged run early: if ``loss`` is NaN/inf, optionally
    save an abort checkpoint (``save_fn``) and raise
    :class:`NonFiniteLossError`. Costs one host sync per call — drivers
    invoke it every ``finite_check_every`` epochs."""
    import numpy as np

    v = float(loss)
    if np.isfinite(v):
        return
    if log is not None:
        log.error("non-finite loss %s at epoch %d — aborting run", v, epoch)
    if save_fn is not None:
        save_fn()
    raise NonFiniteLossError(f"non-finite loss {v} at epoch {epoch}")
