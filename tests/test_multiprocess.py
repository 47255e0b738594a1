"""2-process jax.distributed integration test (SURVEY.md §4 item 5 — the
reference never tested multi-node; we do, on CPU, without a cluster).

Spawns two real processes that rendezvous through jax.distributed and
exercise broadcast_object / all_gather_objects / sharded val sweeps
(see tests/mp_worker.py for what runs inside).
"""
import os
import socket
import subprocess
import sys
import pytest

# long-running module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 device per process
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(rank)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"mp_worker rank {rank}: OK" in out, out
