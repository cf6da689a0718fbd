"""Multi-process distributed bootstrap test (SURVEY §5.8).

Spawns 2 local processes that ``jax.distributed.initialize`` against a
localhost coordinator (2 virtual CPU devices each → a 4-device global
mesh), run the sharded preprocess pipeline with a psum'd cross-batch
statistic, and verify per-shard outputs against the single-process
pipeline.  This exercises the actual multi-host code path
(``init_distributed`` + DCN-style process spanning) rather than only
the single-process virtual mesh.
"""
import os
import re
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_pipeline():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    stats = []
    for out in outs:
        m = re.search(r"DIST_OK \d ([-\d.]+)", out)
        assert m, f"missing DIST_OK line:\n{out}"
        stats.append(float(m.group(1)))
    # the psum'd global statistic must agree across processes
    assert abs(stats[0] - stats[1]) < 1e-6
