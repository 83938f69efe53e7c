"""Multi-host (multi-process) distribution entry point.

The reference is strictly single-process (SURVEY §2.9: no NCCL/MPI/Gloo
anywhere); BASELINE.md's north star demands >=80% scaling 1 host -> >=2
hosts. This module wires ``jax.distributed.initialize`` and makes the
manual-SPMD path (dist/spmd.py) process-aware: the global mesh spans all
hosts' devices, shard_map programs run unchanged (XLA routes the
reduce-scatter/all-to-all/all-gather merges over ICI within a host and
DCN across hosts), and host-side batch construction materializes only
the shards owned by this process's devices.

Launch recipes
--------------

TPU pod slice (each host runs the same command; coordinator/process
topology comes from the TPU runtime metadata automatically)::

    python -m mr_gnas_tpu.cli lp-search --multihost true \
        --mesh-shape N_TOTAL_CHIPS ...

CPU / manual cluster (tests, or GPU-style clusters)::

    # host 0                                # host 1
    MRG_COORD=host0:1234 MRG_NPROC=2 \
    MRG_PID=0 python train.py ...           MRG_PID=1 python train.py ...

with ``initialize()`` reading MRG_* (or explicit kwargs). CPU clusters
need the gloo collectives implementation (``cpu_collectives='gloo'``,
validated 2-process in tests/test_multihost.py).
"""
from __future__ import annotations

import os

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    cpu_collectives: str | None = None,
    local_device_count: int | None = None,
) -> None:
    """Initialize the JAX process cluster (idempotent).

    With no arguments on a TPU pod, topology is auto-detected from the
    runtime environment. Explicit args (or MRG_COORD / MRG_NPROC /
    MRG_PID env vars) drive manual clusters. ``cpu_collectives='gloo'``
    selects the CPU cross-process collective backend;
    ``local_device_count`` forces N virtual CPU devices per process
    (must be set before the backend initializes).
    """
    # NB: do not touch jax.process_count()/jax.devices() here — they
    # would initialize the XLA backend, after which distributed
    # initialization is rejected. The already-initialized check uses the
    # distributed client state directly.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get("MRG_COORD")
    if num_processes is None and "MRG_NPROC" in os.environ:
        num_processes = int(os.environ["MRG_NPROC"])
    if process_id is None and "MRG_PID" in os.environ:
        process_id = int(os.environ["MRG_PID"])
    if local_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_put(x, sharding):
    """Multihost-safe device_put: build a global array from host data.

    Every process holds the full host value ``x`` (the samplers are
    identically seeded across hosts); each process materializes only the
    shards its local devices own via ``make_array_from_callback``. In
    single-process meshes this degenerates to a plain device_put.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])
