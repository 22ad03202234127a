"""Real multi-process jax.distributed training test (2 hosts x 4 CPU devices).

Closes the round-1 gap "multi-host launch wiring unexercised": the jitted
train step runs cross-process GSPMD collectives over the gRPC coordinator,
with each process feeding only its GlobalBatcher-style host shard through
``shard_batch``'s ``make_array_from_process_local_data`` path.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns processes, compile-heavy

RUNNER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_runner.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(n_procs: int, steps: int = 3, mesh: str = None):
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    extra = [f"--mesh={mesh}"] if mesh else []
    procs = [
        subprocess.Popen(
            [sys.executable, RUNNER,
             f"--process-id={i}", f"--num-processes={n_procs}",
             f"--coordinator=localhost:{port}", f"--steps={steps}"]
            + extra,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        losses = [
            float(line.split()[1]) for line in out.splitlines()
            if line.startswith("loss ")
        ]
        assert len(losses) == steps, out + err
        outs.append(losses)
    return outs


@pytest.mark.parametrize("n_procs", [2, 4])
def test_distributed_matches_single_process(n_procs):
    single = _run(1)[0]
    multi = _run(n_procs)
    # every process reports the identical replicated global loss
    for other in multi[1:]:
        np.testing.assert_allclose(multi[0], other, rtol=0, atol=0)
    # and it matches the single-process run on the same global batch
    # (rows arrive permuted across hosts; the mean is order-invariant)
    np.testing.assert_allclose(multi[0], single, atol=1e-5)
    # training actually progresses
    assert single[-1] < single[0]


def test_distributed_pipeline_matches_single_process():
    """pipe2 x data4 over 2 REAL processes: lax.ppermute crosses the gRPC
    process boundary (each process owns one pipeline stage's devices); the
    loss must match the single-process data-parallel run."""
    single = _run(1)[0]
    multi = _run(2, mesh='{"pipe": 2, "data": 4}')
    for other in multi[1:]:
        np.testing.assert_allclose(multi[0], other, rtol=0, atol=0)
    np.testing.assert_allclose(multi[0], single, atol=1e-5)
