"""Closed-loop train->decode->WER pipeline mechanics (benchmarks/closed_loop.py).

The full proof (WER driven to 0.00% on held-out tone-coded utterances,
1024 train utts x 40 epochs) is run by the benchmark script and logged in
docs/PERF.md; this test keeps the pipeline itself green at a few epochs:
fixtures -> tiny HF checkpoint + word-level tokenizer -> cli/finetune ->
cli/decode (beam 4) -> clean_marks -> wer, asserting the loop learns
*something* (WER clearly below the ~100% of an untrained model) and that
every stage produced its artifact.
"""

import os

import pytest

pytestmark = pytest.mark.slow  # minutes of real training


def test_closed_loop_pipeline(tmp_path):
    from benchmarks.closed_loop import run

    # easy knobs on CPU (16 words, clean audio); the hardened 64-word noisy
    # canary runs on TPU via the benchmark CLI (docs/TESTING.md)
    result = run(str(tmp_path), epochs=10, n_train=192, frame_budget=400,
                 n_words=16, noise_std=0.0, rate_var=0.0)
    assert result["all"] > 0
    # 10 epochs is far from convergence (3 tasks now, TRN needs the LLM to
    # learn a vocab mapping); an untrained model scores ~95-100% (often
    # worse with insertions), convergence scores 0.0 (docs/PERF.md)
    assert result["wer"] < 80.0, result
    assert os.path.exists(os.path.join(str(tmp_path), "wer_report.txt"))
    assert os.path.exists(result["ckpt"])
    # per-task WER split present for all three tasks
    assert set(result["per_task_wer"]) == {"ASR", "REV", "TRN"}
    # decode artifacts in the reference's key\ttext format; 32 held-out
    # utterances x 3 tasks (ASR + REV + TRN translation)
    pred = os.path.join(str(tmp_path), "decode", "test_pred")
    with open(pred) as f:
        lines = f.read().splitlines()
    assert len(lines) == 96 and all("\t" in l for l in lines)

    # trained-checkpoint pool-vs-static compare (real EOS raggedness);
    # pool_compare itself asserts per-key output identity between modes
    from benchmarks.closed_loop import pool_compare

    cmp = pool_compare(str(tmp_path), result["ckpt"], repeats=1)
    assert cmp["outputs_identical"]
    assert cmp["n_requests"] == 96
    assert 1 <= cmp["completion_lengths"]["min"]
    assert cmp["completion_lengths"]["max"] <= 12

    # serve-route compare through the real cli/serve.py: auto probes the
    # pool then (short answers) switches to static; texts must agree per
    # key across static/pool/auto up to a few near-tie argmax flips (the
    # routes pad to different shapes; see route_compare docstring)
    from benchmarks.closed_loop import route_compare

    rt = route_compare(str(tmp_path), req_repeats=1, timed_runs=0)
    assert rt["n_requests"] == 96
    assert rt["n_text_mismatch"] <= 4


def test_closed_loop_ctc_warmstart(tmp_path):
    """The --ctc-warmstart path: CTC-pretrain the encoder (tasu_transfer
    stage A through closed_loop's word-id shim tokenizer), export the
    partial encoder ckpt, and joint-finetune from it.  Mirrors the
    reference regime (pretrained SenseVoice at ps-slm.py:163-170, then
    finetuned); mechanics only — the TPU canary proves convergence."""
    from benchmarks.closed_loop import run

    result = run(str(tmp_path), epochs=4, n_train=96, frame_budget=400,
                 n_words=8, noise_std=0.0, rate_var=0.0,
                 ctc_warmstart_epochs=3)
    assert result["all"] > 0
    assert os.path.exists(os.path.join(str(tmp_path), "encoder_ctc.bin"))
    import torch

    keys = torch.load(os.path.join(str(tmp_path), "encoder_ctc.bin"),
                      map_location="cpu", weights_only=True)
    assert all(k.startswith("encoder.") for k in keys)
