"""Data pipeline: manifest streaming, prompts, batching, collation, and a
full audio-TASU forward from raw waveforms (on-device front end)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.config import DataConfig, ModelConfig, TrainConfig
from ps_slm_tpu.data import audio_io
from ps_slm_tpu.data.dataset import (
    Collator, GlobalBatcher, MultiTaskDataset, dynamic_batches,
    get_speech_dataset, load_multiprompt,
)
from ps_slm_tpu.data.tokenizer import StubTokenizer


def _fixtures(tmp_path, n=6, rate=16000):
    """Tiny wav ark + manifest + multiprompt."""
    rng = np.random.default_rng(0)
    entries = {}
    for i in range(n):
        dur = rng.integers(rate // 2, rate * 2)
        entries[f"utt{i}"] = (rate, rng.normal(size=dur).astype(np.float32) * 0.1)
    ark = tmp_path / "wav.ark"
    offsets = audio_io.write_kaldi_wav_ark(str(ark), entries)

    split_dir = tmp_path / "train"
    split_dir.mkdir()
    rows = []
    for i in range(n):
        rows.append({
            "key": f"utt{i}",
            "path": f"{ark}:{offsets[f'utt{i}']}",
            "target": f"hello world sample {i}",
            "GT": f"hello world sample {i}",
            "task": "ASR",
        })
    with open(split_dir / "multitask.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    prompt_file = tmp_path / "multiprompt.jsonl"
    with open(prompt_file, "w") as f:
        f.write(json.dumps({"task": "ASR", "prompt": "transcribe:"}) + "\n")
        f.write(json.dumps({"task": "hotword", "prompt": "with hotword {}:"}) + "\n")

    cfg = DataConfig(
        multitask_prompt_path=str(prompt_file),
        train_scp_file_path=str(split_dir),
        train_max_frame_length=200,
        ds_rate=1,
        feature_bucket=16,
        token_bucket=8,
    )
    return cfg


def test_manifest_streaming_and_labels(tmp_path):
    cfg = _fixtures(tmp_path)
    tok = StubTokenizer()
    ds = MultiTaskDataset(cfg, tok, "train")
    samples = list(ds)
    assert len(samples) == 6
    s = samples[0]
    assert s.input_ids[-1] == tok.eos_token_id
    assert (s.labels[: s.prompt_len] == -100).all()
    assert (s.labels[s.prompt_len:] == s.input_ids[s.prompt_len:]).all()
    assert tok.speech_token_id in s.input_ids[: s.prompt_len]
    assert s.est_frames > 0 and s.waveform is not None


def test_audio_length_filter(tmp_path):
    cfg = _fixtures(tmp_path)
    # append a too-short row
    short = tmp_path / "short.wav"
    audio_io.write_wav(str(short), 16000, np.zeros(100, np.float32))
    with open(os.path.join(cfg.train_scp_file_path, "multitask.jsonl"), "a") as f:
        f.write(json.dumps({
            "key": "tiny", "path": str(short), "target": "x", "GT": "x",
            "task": "ASR",
        }) + "\n")
    ds = MultiTaskDataset(cfg, StubTokenizer(), "train")
    keys = [s.key for s in ds]
    assert "tiny" not in keys


def test_dynamic_batching_budget(tmp_path):
    cfg = _fixtures(tmp_path)
    ds = MultiTaskDataset(cfg, StubTokenizer(), "train")
    samples = list(ds)
    batches = list(dynamic_batches(iter(samples), 200, 1))
    assert sum(len(b) for b in batches) == len(samples)
    for b in batches:
        mx = max(len(s.input_ids) + s.est_frames - 1 for s in b)
        assert len(b) * mx <= 200 or len(b) == 1


def test_collator_bucketing(tmp_path):
    cfg = _fixtures(tmp_path)
    tok = StubTokenizer()
    ds = MultiTaskDataset(cfg, tok, "train")
    samples = list(ds)[:3]
    batch = Collator(tok, cfg)(samples)
    assert batch["input_ids"].shape[1] % cfg.token_bucket == 0
    assert batch["waveform"].shape[1] % (cfg.feature_bucket * 960) == 0
    # right padding in train mode
    row_len = len(samples[0].input_ids)
    assert batch["attention_mask"][0, :row_len].all()


def test_global_batcher_determinism(tmp_path):
    cfg = _fixtures(tmp_path)
    tok = StubTokenizer()

    def batches(host_id, num_hosts):
        gb = get_speech_dataset(
            cfg, tok, "train", num_hosts=num_hosts, host_id=host_id
        )
        return list(gb)

    all0 = batches(0, 2)
    all1 = batches(1, 2)
    # same number of steps on every host — no join barrier needed
    assert len(all0) == len(all1)
    for b0, b1 in zip(all0, all1):
        assert b0["input_ids"].shape[0] == b1["input_ids"].shape[0]


@pytest.mark.slow
def test_waveform_forward_end_to_end(tmp_path):
    """Raw waveforms through the on-device front end into audio TASU."""
    from ps_slm_tpu.models.tasu import forward, model_factory

    cfg = _fixtures(tmp_path)
    tok = StubTokenizer()
    gb = get_speech_dataset(cfg, tok, "train")
    batch_np = next(iter(gb))

    tc = TrainConfig(ctc_posterior=True, do_psd=True)
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
        encoder_config_overrides={"input_size": 560},
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    model.speech_token_id = tok.speech_token_id
    model.pad_token_id = tok.pad_token_id
    model.use_flash = False

    jbatch = {
        k: jnp.asarray(v) for k, v in batch_np.items()
        if k not in ("keys", "targets", "GT")
    }
    loss, metrics = forward(model, model.params, jbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_skip_batches_markers_then_bit_equal(tmp_path):
    """skip_batches=k yields k uncollated markers, then batches that are
    array-for-array identical to the unskipped stream (resume fast-forward
    correctness: training/loop.py discards exactly the markers)."""
    cfg = _fixtures(tmp_path, n=16)
    tok = StubTokenizer()
    full = list(get_speech_dataset(cfg, tok, "train"))
    k = 2
    assert len(full) > k
    skipped = list(get_speech_dataset(cfg, tok, "train", skip_batches=k))
    assert len(skipped) == len(full)
    for b in skipped[:k]:
        assert b == {"batch_skipped": True}
    for b0, b1 in zip(full[k:], skipped[k:]):
        assert set(b0) == set(b1)
        for key in b0:
            np.testing.assert_array_equal(
                np.asarray(b0[key]), np.asarray(b1[key]), err_msg=key
            )


def test_skip_batches_defers_audio_decode(tmp_path, monkeypatch):
    """With skip_batches>0 the dataset goes lazy: skipped buckets read
    headers only and never decode samples."""
    cfg = _fixtures(tmp_path, n=16)
    tok = StubTokenizer()
    real = audio_io.load_audio
    calls = []

    def counting(path, target_rate=16000):
        calls.append(path)
        return real(path, target_rate)

    monkeypatch.setattr(audio_io, "load_audio", counting)
    list(get_speech_dataset(cfg, tok, "train"))
    n_full = len(calls)
    assert n_full == 16
    calls.clear()
    list(get_speech_dataset(cfg, tok, "train", skip_batches=2))
    assert 0 < len(calls) < n_full


def test_global_batcher_cross_host_shapes_and_keys():
    """Pad shapes and batch keys must come from the GLOBAL bucket: hosts'
    slices can bucket to different max lengths, and gt_ids presence can
    differ per slice — every host must still build a batch with the
    identical key set and array shapes (different jitted programs per
    process would hang the collectives)."""
    from ps_slm_tpu.config import DataConfig
    from ps_slm_tpu.data.dataset import Sample

    def mk(key, toks, wav_n, gt_n):
        return Sample(
            key=key,
            input_ids=np.arange(toks, dtype=np.int32),
            labels=np.arange(toks, dtype=np.int32),
            prompt_len=1,
            waveform=np.zeros(wav_n, np.float32),
            est_frames=wav_n // 960,
            gt_ids=np.arange(gt_n, dtype=np.int32),
            target="t", gt="g", task="ASR",
            waveform_len=wav_n,
        )

    # host0 gets rows [0,2], host1 gets rows [1,3]; ONLY host0's rows carry
    # the long lengths and the nonzero gt_ids
    samples = [
        mk("long", 40, 40000, 12),
        mk("s1", 4, 8000, 0),
        mk("s2", 5, 9000, 0),
        mk("s3", 4, 8500, 0),
    ]
    cfg = DataConfig(feature_bucket=16, token_bucket=8)
    tok = StubTokenizer()
    coll = Collator(tok, cfg)

    outs = []
    for host in range(2):
        gb = GlobalBatcher(
            samples, coll, max_frame_length=10**9, ds_rate=1,
            num_hosts=2, host_id=host, fixed_batch_size=4,
        )
        outs.append(list(gb))
    assert len(outs[0]) == len(outs[1]) == 1
    b0, b1 = outs[0][0], outs[1][0]
    assert set(b0) == set(b1)
    for k in b0:
        if hasattr(b0[k], "shape"):
            assert b0[k].shape == b1[k].shape, k
    # shapes reflect the GLOBAL maxima (host1 has no long row locally)
    assert b1["input_ids"].shape[1] == b0["input_ids"].shape[1] == 40
    assert "gt_ids" in b1 and b1["gt_ids"].shape[1] == 16  # bucketed 12


def test_gt_unicode_handling(tmp_path):
    """Escaped-ASCII GT unescapes (the reference's manifest convention,
    speech_dataset_large.py:99-105); real UTF-8 GT must NOT be mojibaked
    by unicode_escape's latin-1 reinterpretation."""
    rate = 16000
    entries = {"u0": (rate, np.zeros(rate, np.float32)),
               "u1": (rate, np.zeros(rate, np.float32))}
    ark = tmp_path / "wav.ark"
    offsets = audio_io.write_kaldi_wav_ark(str(ark), entries)
    split_dir = tmp_path / "train"
    split_dir.mkdir()
    rows = [
        {"key": "u0", "path": f"{ark}:{offsets['u0']}",
         "target": "ni hao", "GT": "\\u4f60\\u597d", "task": "ASR"},
        {"key": "u1", "path": f"{ark}:{offsets['u1']}",
         "target": "ni hao", "GT": "你好", "task": "ASR"},
    ]
    with open(split_dir / "multitask.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    prompt_file = tmp_path / "multiprompt.jsonl"
    prompt_file.write_text(json.dumps({"task": "ASR", "prompt": "t:"}) + "\n")
    cfg = DataConfig(
        multitask_prompt_path=str(prompt_file),
        train_scp_file_path=str(split_dir),
        feature_bucket=16, token_bucket=8,
    )
    ds = MultiTaskDataset(cfg, StubTokenizer(), "train")
    got = {s.key: s.gt for s in ds}
    assert got["u0"] == "你好"  # literal \uXXXX escapes decoded
    assert got["u1"] == "你好"  # real UTF-8 untouched

    # non-string GT (explicit JSON null / number) degrades instead of
    # crashing the stream — GT only feeds the _gt scoring file
    for bad_gt, want in ((None, ""), (7, "7")):
        rows[0]["GT"] = bad_gt
        with open(split_dir / "multitask.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        got = {s.key: s.gt for s in MultiTaskDataset(cfg, StubTokenizer(), "train")}
        assert got["u0"] == want


def test_audio_seconds_metric_masks_padded_rows(tmp_path):
    """The collator reports true pre-pad audio seconds; the train loop's
    throughput meter must exclude batch_valid=False repeat rows."""
    from ps_slm_tpu.training.loop import _batch_audio_seconds

    cfg = _fixtures(tmp_path, n=3)
    tok = StubTokenizer()
    batches = [
        b for h in range(2)
        for b in get_speech_dataset(cfg, tok, "train", num_hosts=2, host_id=h)
    ]
    saw_padded = False
    for batch in batches:
        assert "audio_seconds" in batch
        valid = batch["batch_valid"]
        expect = float(np.sum(np.asarray(batch["audio_seconds"])[valid]))
        assert _batch_audio_seconds(batch) == pytest.approx(expect)
        if not valid.all():
            saw_padded = True
            assert _batch_audio_seconds(batch) < float(
                np.sum(batch["audio_seconds"])
            )
    assert saw_padded  # 3 rows over 2 hosts must pad somewhere
