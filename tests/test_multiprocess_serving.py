"""Multi-process (2 procs x 4 CPU devices) distributed serving: the SPMD
step runs across process boundaries via jax.distributed (SURVEY §4
'multi-GPU without a cluster' pattern — mp spawn + TCP init)."""

import ast
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_serving():
    port = str(_free_port())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=repo,
    )
    worker = os.path.join(os.path.dirname(__file__), "helpers",
                          "mp_serving_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    toks = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("TOKENS"):
                _, pid, rest = line.split(" ", 2)
                toks[int(pid)] = ast.literal_eval(rest)
    assert set(toks) == {0, 1}, outs
    assert toks[0] == toks[1]
    # all three requests generated their full budgets
    assert [len(t) for t in toks[0]] == [4, 3, 4]
