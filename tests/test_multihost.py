"""Multi-host entry point (dist/multihost.py): a 2-process CPU cluster
(gloo collectives) runs one SPMD train step; replicated params/stats
must come out IDENTICAL on both processes while their edge shards
differ (VERDICT r2 item 2 done-criterion)."""
import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_spmd_step_replicated_state():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = str(_free_port())
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))
    a, b = sorted(outs, key=lambda o: o["pid"])
    # the shard_map'd step keeps the model state replicated across hosts
    assert a["params_digest"] == b["params_digest"]
    assert a["bstats_digest"] == b["bstats_digest"]
    assert a["loss"] == b["loss"]
    # while each process computed on DIFFERENT edge shards
    assert a["shard_digest"] != b["shard_digest"]
