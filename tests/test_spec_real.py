"""Rot guards for the trained-checkpoint speculative benchmarks.

The committed artifacts (`benchmarks/spec_real_tpu.json`,
`benchmarks/spec_pool_real_tpu.json`) were measured on TPU against the
TASU-transfer canary checkpoints; these tests keep the harnesses runnable
end to end on CPU: quick transfer training -> real CTC drafts ->
per-row/batch speculative accounting (`benchmarks/spec_real.py`) and
pool forwards-to-drain (`benchmarks/spec_pool_real.py`), with the
structural invariants that make the artifacts meaningful (output
identity, acceptance <= offered, per-row reduction >= 1).
"""

import pytest

pytestmark = pytest.mark.slow  # minutes of real training + decodes


@pytest.fixture(scope="module")
def transfer_workdir(tmp_path_factory):
    from benchmarks.tasu_transfer import run

    wd = str(tmp_path_factory.mktemp("transfer"))
    run(wd, n_train=192, enc_epochs=4, text_epochs=8, n_words=16,
        noise_std=0.0, rate_var=0.0, frame_budget=400)
    return wd


def test_spec_real_accounting(transfer_workdir):
    from benchmarks.spec_real import run as spec_run

    res = spec_run(transfer_workdir, windows=(8,), timed_runs=1)
    assert res["n_utts"] > 0
    assert res["greedy_llm_forwards"] > 0
    win = res["windows"]["8"]
    # speculative decode must be bit-identical to greedy (fp32 fixture)
    assert win["output_identical"], win
    assert win["batch_forward_reduction"] >= 1.0
    pr = win["per_row"]
    # every spec forward emits >= 1 token, so per-row spec forwards can
    # never exceed greedy's token-serial count
    assert 0 < pr["spec_llm_forwards"] <= pr["greedy_llm_forwards"]
    assert pr["forward_reduction"] >= 1.0
    assert 0 <= pr["draft_tokens_accepted"] <= pr["draft_tokens_offered"]
    assert pr["acceptance_rate"] <= 1.0


def test_spec_pool_real_drain(transfer_workdir):
    from benchmarks.spec_pool_real import run as pool_run

    res = pool_run(transfer_workdir, limit=8)
    # the two pools must produce identical tokens per key — speculative
    # verification is exact, the pool only changes scheduling
    assert res["outputs_identical"], res
    assert res["n_requests"] == 8
    assert res["greedy_pool"]["forwards_to_drain"] > 0
    assert res["spec_pool"]["forwards_to_drain"] > 0
    assert res["pool_forward_reduction"] > 0
