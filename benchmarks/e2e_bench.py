"""End-to-end training throughput: manifest -> audio read -> tokenize ->
prefetch -> on-device fbank -> train step.

The reference pipeline was *dataloader-bound* (SURVEY.md §3.1: host-side
funasr fbank in DataLoader workers, ``speech_dataset_large.py:134-146``).
This harness measures the full host+device path of the TPU rebuild — the
real ``GlobalBatcher`` streaming a wav ark manifest, the prefetch thread,
``to_device_batch`` placement, and the jitted audio-TASU step with the fused
on-device front end — so host IO that ``bench.py`` (device-step-only)
excludes is charged here.

Prints ONE JSON line: ``e2e_audio_sec_per_sec_per_chip`` with
``vs_device_only`` = ratio against a device-only measurement of the *same*
step (>= 0.9 means the host pipeline hides behind the device step, the
acceptance bar from VERDICT round 1 item 5).

Tokenization uses the stub tokenizer (no checkpoint assets in this
environment); host tokenization of ~30 tokens/utt is negligible next to the
~1.9 MB/utt audio read that dominates host cost.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A100_EQUIV_TARGET = 6 * 60.0  # audio-sec/sec/chip (see bench.py)

WARMUP_BATCHES = 3
MEASURE_BATCHES = 8


def _make_fixture(root: str, n_utts: int, dur_s: float, rate: int = 16000):
    """wav ark + multitask.jsonl + multiprompt.jsonl at reference scale."""
    from ps_slm_tpu.data import audio_io

    rng = np.random.default_rng(0)
    n = int(dur_s * rate)
    entries = {
        f"utt{i}": (rate, (rng.normal(size=n) * 0.1).astype(np.float32))
        for i in range(n_utts)
    }
    ark = os.path.join(root, "wav.ark")
    offsets = audio_io.write_kaldi_wav_ark(ark, entries)

    split = os.path.join(root, "train")
    os.makedirs(split, exist_ok=True)
    with open(os.path.join(split, "multitask.jsonl"), "w") as f:
        for i in range(n_utts):
            f.write(json.dumps({
                "key": f"utt{i}", "path": f"{ark}:{offsets[f'utt{i}']}",
                "target": "the quick brown fox jumps over the lazy dog "
                          f"take {i}",
                "GT": f"the quick brown fox jumps over the lazy dog take {i}",
                "task": "ASR",
            }) + "\n")
    prompts = os.path.join(root, "multiprompt.jsonl")
    with open(prompts, "w") as f:
        f.write(json.dumps({"task": "ASR", "prompt": "transcribe:"}) + "\n")
    return split, prompts


def main():
    import jax
    import jax.numpy as jnp

    from ps_slm_tpu.config import DataConfig, ModelConfig, TrainConfig
    from ps_slm_tpu.data.dataset import get_speech_dataset
    from ps_slm_tpu.data.prefetch import device_prefetch
    from ps_slm_tpu.data.tokenizer import StubTokenizer
    from ps_slm_tpu.models.tasu import model_factory, trainable_mask
    from ps_slm_tpu.parallel import mesh as meshlib
    from ps_slm_tpu.training.loop import to_device_batch
    from ps_slm_tpu.training.step import make_train_step
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if on_tpu:  # reference scale (bench.py config)
        llm_over = dict(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12,
            num_key_value_heads=2, head_dim=128, rope_theta=1e6,
        )
        enc_over = dict(
            input_size=560, output_size=512, attention_heads=4,
            linear_units=2048, num_blocks=50, tp_blocks=20, kernel_size=11,
            vocab_size=25055,
        )
        batch, dur_s = 4, 29.5  # ~512 LFR frames after bucketing
    else:  # CPU smoke config so the harness itself is testable
        llm_over = dict(
            vocab_size=1024, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=32,
        )
        enc_over = dict(
            input_size=560, output_size=64, attention_heads=2,
            linear_units=128, num_blocks=2, tp_blocks=1, kernel_size=11,
            vocab_size=256,
        )
        batch, dur_s = 2, 2.0

    tc = TrainConfig(
        ctc_posterior=True, do_psd=True, freeze_llm=True, freeze_encoder=True,
        lr=5e-5, warmup_steps=200, total_steps=15000, remat=False,
    )
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=enc_over["vocab_size"], llm_dim=llm_over["hidden_size"],
        encoder_projector_ds_rate=1,
        llm_config_overrides=llm_over, encoder_config_overrides=enc_over,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0), dtype=dtype)
    tok = StubTokenizer()
    model.speech_token_id = tok.speech_token_id
    model.pad_token_id = tok.pad_token_id

    mesh = meshlib.build_mesh(None)
    model.params = meshlib.shard_params(model.params, mesh)
    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)
    step = make_train_step(model, tx, trainable)
    key = jax.random.PRNGKey(0)

    # fbank front end config: 80 mel, LFR 7/6 -> 560-dim, matching the
    # reference funasr WavFrontend (ps-slm.py:426)
    with tempfile.TemporaryDirectory() as root:
        n_utts = batch * (WARMUP_BATCHES + MEASURE_BATCHES)
        split, prompts = _make_fixture(root, n_utts, dur_s)
        # budget sized so every dynamic bucket holds exactly `batch` equal-
        # length utterances: cost ~= tokens + LFR frames
        est_cost = int(dur_s / 0.060) + 40
        dc = DataConfig(
            multitask_prompt_path=prompts, train_scp_file_path=split,
            train_max_frame_length=batch * est_cost, ds_rate=1,
        )
        model.fbank_cfg = dc.fbank

        def batches():
            return iter(get_speech_dataset(dc, tok, "train"))

        # -- end-to-end pass -------------------------------------------------
        seen = 0
        audio_sec = 0.0
        t0 = None
        for i, (host_batch, gbatch) in enumerate(device_prefetch(
            batches(), lambda b: to_device_batch(b, mesh), depth=2,
        )):
            state, metrics = step(state, gbatch, key)
            if i + 1 == WARMUP_BATCHES:
                assert np.isfinite(float(metrics["loss"]))  # sync
                t0 = time.perf_counter()
            elif i + 1 > WARMUP_BATCHES:
                audio_sec += float(np.sum(host_batch["waveform_length"])) / 16000.0
                seen += 1
        assert np.isfinite(float(metrics["loss"]))  # device sync (axon note in bench.py)
        dt = time.perf_counter() - t0
        n_chips = len(jax.devices())
        e2e_rate = audio_sec / dt / n_chips

        # -- device-only pass over the same (already-placed) batches ---------
        host_batches = list(batches())
        dev_batches = [
            to_device_batch(b, mesh) for b in host_batches[:WARMUP_BATCHES + 2]
        ]
        for b in dev_batches[:WARMUP_BATCHES]:
            state, metrics = step(state, b, key)
        assert np.isfinite(float(metrics["loss"]))
        reps = MEASURE_BATCHES
        per_step_audio = float(
            np.sum(dev_batches[WARMUP_BATCHES]["waveform_length"])
        ) / 16000.0
        t0 = time.perf_counter()
        for i in range(reps):
            state, metrics = step(
                state, dev_batches[WARMUP_BATCHES + (i % 2)], key
            )
        assert np.isfinite(float(metrics["loss"]))
        dev_dt = time.perf_counter() - t0
        dev_rate = per_step_audio * reps / dev_dt / n_chips

    print(json.dumps({
        "metric": "e2e_audio_sec_per_sec_per_chip",
        "value": round(e2e_rate, 2),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(e2e_rate / A100_EQUIV_TARGET, 3),
        "device_only": round(dev_rate, 2),
        "vs_device_only": round(e2e_rate / dev_rate, 3),
        "steps": seen,
    }))


if __name__ == "__main__":
    sys.exit(main())
