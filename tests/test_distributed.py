"""Multi-host scaffolding: a REAL 2-process jax.distributed run on CPU.

The standard cluster-free stand-in for a multi-host TPU pod (SURVEY.md
§4): two OS processes with 2 CPU devices each join one coordination
service and execute the sharded-dataset data-parallel train step over
the 4-device GLOBAL mesh. The pmean'd losses are replicated, so both
processes must report bit-identical values.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    env_base = {
        **os.environ,
        "JAX_COORDINATOR": f"127.0.0.1:{port}",
        "NPROC": "2",
        # the subprocess must not inherit this process's fake-device flags
        "XLA_FLAGS": "",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER],
            env={**env_base, "PROC_ID": str(i)},
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, l0, l1 = line.split()
                results[int(pid)] = (l0, l1)
    assert set(results) == {0, 1}, f"missing worker results: {outs}"
    # pmean-replicated losses: bit-identical on both processes
    assert results[0] == results[1], results
    # the multi-host sharded eval render matched the single-chip render
    # on both hosts (asserted inside each worker)
    for out in outs:
        assert "EVAL_OK" in out, f"sharded eval parity missing:\n{out}"
