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


CLI_RUNNER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_cli_runner.py")


def _build_cli_fixtures(workdir):
    import json

    from ps_slm_tpu.data import audio_io

    rng = np.random.default_rng(0)
    rate = 16000
    entries = {}
    for i in range(16):
        dur = int(rng.integers(rate // 2, rate))
        entries[f"utt{i}"] = (
            rate, rng.normal(size=dur).astype(np.float32) * 0.1
        )
    ark = os.path.join(workdir, "wav.ark")
    offsets = audio_io.write_kaldi_wav_ark(ark, entries)
    for split in ("train", "dev", "test"):
        d = os.path.join(workdir, split)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "multitask.jsonl"), "w") as f:
            for i in range(16):
                f.write(json.dumps({
                    "key": f"utt{i}",
                    "path": f"{ark}:{offsets[f'utt{i}']}",
                    "target": f"word{i} hello",
                    "GT": f"word{i} hello",
                    "task": "ASR",
                }) + "\n")
    with open(os.path.join(workdir, "multiprompt.jsonl"), "w") as f:
        f.write(json.dumps({"task": "ASR", "prompt": "transcribe:"}) + "\n")


def _run_cli(workdir, out_name, n_procs, epochs, resume_from=None):
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    extra = [f"--resume-from={resume_from}"] if resume_from else []
    procs = [
        subprocess.Popen(
            [sys.executable, CLI_RUNNER,
             f"--process-id={i}", f"--num-processes={n_procs}",
             f"--coordinator=localhost:{port}",
             f"--workdir={workdir}", f"--out-name={out_name}",
             f"--epochs={epochs}"] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(n_procs)
    ]
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"rc={p.returncode}\n{out[-2000:]}\n{err[-4000:]}"
    return os.path.join(workdir, out_name, "last")


def _load_export(last_dir):
    import torch

    sd = torch.load(
        os.path.join(last_dir, "pytorch_model.bin"),
        map_location="cpu", weights_only=False,
    )
    return {k: np.asarray(v) for k, v in sd.items()}


def test_cli_finetune_two_process_matches_single_and_resumes(tmp_path):
    """The full launcher under 2-process jax.distributed: per-process
    GlobalBatcher shards feed the sharded step; Orbax saves the
    cross-process state (save_last); host 0 exports the reference-format
    checkpoint from allgathered shards.

    Contracts (the last wiring between "step works multi-host" and "the
    launcher works multi-host"):
      * 2-process == 1-process at float tolerance.  GlobalBatcher's
        contiguous block slices reassemble the EXACT single-process global
        batch (make_array_from_process_local_data fills global rows in
        device order), so the only residue is cross-process collective
        reduction order — ulp-level (measured 1.5e-8 after 2 adamw steps;
        before the block-slice + stable-hash fixes it was lr-level 1e-3).
      * 2-process resume == 2-process straight BIT-equal (same topology,
        same collectives: Orbax restore + stream fast-forward must add
        nothing)."""
    w = str(tmp_path)
    _build_cli_fixtures(w)

    straight2 = _load_export(_run_cli(w, "out_straight", 2, epochs=2))
    single = _load_export(_run_cli(w, "out_single", 1, epochs=2))
    assert set(straight2) == set(single)
    for k in straight2:
        np.testing.assert_allclose(
            straight2[k], single[k], rtol=0, atol=1e-6, err_msg=k
        )

    first = _run_cli(w, "out_first", 2, epochs=1)
    resumed = _load_export(_run_cli(
        w, "out_resumed", 2, epochs=2,
        resume_from=os.path.join(first, "state"),
    ))
    assert set(resumed) == set(straight2)
    for k in straight2:
        np.testing.assert_array_equal(resumed[k], straight2[k], err_msg=k)
