"""FLAC decode path + whisper front-end dataset path (VERDICT r1 item 6).

Reference behaviors: flac manifests decode via torchaudio/libFLAC
(speech_dataset_large.py:119-123); encoder=="whisper" runs pad_or_trim +
128-mel log_mel_spectrogram producing fixed [128, 3000] features
(speech_dataset_large.py:108-118).
"""

import json

import numpy as np
import pytest

from ps_slm_tpu.config import DataConfig
from ps_slm_tpu.data import audio_io, flac
from ps_slm_tpu.data.dataset import MultiTaskDataset, get_speech_dataset
from ps_slm_tpu.data.tokenizer import StubTokenizer


# ----------------------------------------------------------------------------
# flac codec
# ----------------------------------------------------------------------------

def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (
        0.4 * np.sin(2 * np.pi * 331 * t) + 0.1 * rng.normal(size=n)
    ).astype(np.float32)


def test_flac_twin_bit_equal_to_wav(tmp_path):
    """A flac built from the decoded wav PCM decodes bit-identically."""
    x = _signal(16000 * 2 + 77)
    wav = tmp_path / "a.wav"
    fl = tmp_path / "a.flac"
    audio_io.write_wav(str(wav), 16000, x)
    wa = audio_io.load_audio(str(wav))
    flac.write_flac(str(fl), 16000, wa)
    fa = audio_io.load_audio(str(fl))
    np.testing.assert_array_equal(wa, fa)


def test_flac_native_matches_python(tmp_path):
    fl = tmp_path / "b.flac"
    flac.write_flac(str(fl), 16000, _signal(16000 + 313, seed=1))
    lib = audio_io._native()
    if lib is None or not hasattr(lib, "ps_flac_info"):
        pytest.skip("native lib not built")
    r1, y1 = audio_io.read_flac(str(fl))
    r2, y2 = flac.read_flac(str(fl))
    assert r1 == r2 == 16000
    np.testing.assert_array_equal(y1, y2)


def test_flac_stereo_and_rate(tmp_path):
    x = _signal(22050, seed=2)
    stereo = np.stack([x, -0.5 * x], axis=1)
    fl = tmp_path / "c.flac"
    flac.write_flac(str(fl), 22050, stereo)
    rate, y = flac.read_flac(str(fl))
    assert rate == 22050 and len(y) == 22050
    # mono downmix = channel mean
    pcm = np.clip(np.round(stereo * 32768.0), -32768, 32767)
    want = (pcm[:, 0] + pcm[:, 1]) / 2.0 / 32768.0
    np.testing.assert_allclose(y, want, atol=1e-7)


def test_flac_all_subframe_types(tmp_path):
    """Constant + tonal + noise segments exercise fixed orders 0-2."""
    seg = np.concatenate([
        np.zeros(1000, np.float32),                    # constant
        np.full(1000, 0.25, np.float32),               # constant nonzero
        _signal(5000, seed=3),                         # tonal+noise
        np.linspace(-0.9, 0.9, 3000).astype(np.float32),  # ramp (order 2)
    ])
    fl = tmp_path / "d.flac"
    flac.write_flac(str(fl), 16000, seg, block_size=1024)
    _, y = flac.read_flac(str(fl))
    pcm = np.clip(np.round(seg * 32768.0), -32768, 32767).astype(np.int32)
    np.testing.assert_array_equal(
        np.round(y * 32768.0).astype(np.int32), pcm
    )


# ----------------------------------------------------------------------------
# dataset integration
# ----------------------------------------------------------------------------

def _manifest(tmp_path, rows, encoder="sensevoice"):
    split_dir = tmp_path / "train"
    split_dir.mkdir(exist_ok=True)
    with open(split_dir / "multitask.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    prompt_file = tmp_path / "multiprompt.jsonl"
    with open(prompt_file, "w") as f:
        f.write(json.dumps({"task": "ASR", "prompt": "transcribe:"}) + "\n")
    return DataConfig(
        multitask_prompt_path=str(prompt_file),
        train_scp_file_path=str(split_dir),
        train_max_frame_length=20000,
        ds_rate=1, feature_bucket=16, token_bucket=8,
        encoder=encoder,
    )


def test_flac_manifest_rows_stream(tmp_path):
    """flac and wav rows of the same audio yield identical waveforms."""
    x = _signal(16000, seed=4)
    wav = tmp_path / "u.wav"
    fl = tmp_path / "u.flac"
    audio_io.write_wav(str(wav), 16000, x)
    flac.write_flac(str(fl), 16000, audio_io.load_audio(str(wav)))
    rows = [
        {"key": "w", "path": str(wav), "target": "hi", "GT": "hi",
         "task": "ASR"},
        {"key": "f", "path": str(fl), "target": "hi", "GT": "hi",
         "task": "ASR"},
    ]
    cfg = _manifest(tmp_path, rows)
    samples = list(MultiTaskDataset(cfg, StubTokenizer(), "train"))
    assert [s.key for s in samples] == ["w", "f"]
    np.testing.assert_array_equal(samples[0].waveform, samples[1].waveform)


def test_whisper_dataset_path(tmp_path):
    """encoder=="whisper": fixed [B, 3000, 128] mel features in the batch,
    matching the op applied directly (speech_dataset_large.py:108-118)."""
    from ps_slm_tpu.ops.fbank import pad_or_trim, whisper_log_mel

    x = _signal(16000 * 2, seed=5)
    wav = tmp_path / "v.wav"
    audio_io.write_wav(str(wav), 16000, x)
    rows = [{"key": "v", "path": str(wav), "target": "hello", "GT": "hello",
             "task": "ASR"}]
    cfg = _manifest(tmp_path, rows, encoder="whisper")
    batches = list(get_speech_dataset(cfg, StubTokenizer(), "train"))
    assert len(batches) == 1
    b = batches[0]
    assert "waveform" not in b
    assert b["input_features"].shape == (1, 3000, 128)
    np.testing.assert_array_equal(b["input_feature_length"], [3000])

    wave = audio_io.load_audio(str(wav))
    want = np.asarray(whisper_log_mel(
        np.asarray(pad_or_trim(wave))[None], n_mels=128
    ))
    np.testing.assert_allclose(
        b["input_features"], np.swapaxes(want, 1, 2), rtol=1e-6, atol=1e-6
    )


def test_flac_truncated_stream_no_overread(tmp_path):
    """A FLAC whose STREAMINFO overstates the decodable frames (file
    truncated at/inside a frame) must not read past the decoded buffer:
    the native reader previously forced got = total_samples and memcpy'd
    that many samples regardless of how many were decoded."""
    import ctypes

    fl = tmp_path / "t.flac"
    flac.write_flac(str(fl), 16000, _signal(16000 + 313, seed=2))
    data = fl.read_bytes()
    lib = audio_io._native()
    if lib is None or not hasattr(lib, "ps_flac_info"):
        pytest.skip("native lib not built")

    meta = lib._FlacMeta()
    assert lib.ps_flac_info(str(fl).encode(), 0, ctypes.byref(meta)) == 0
    total = meta.total_samples
    assert total == 16000 + 313

    # cut most of the frame bytes off; header (and its total_samples) intact
    cut = tmp_path / "cut.flac"
    cut.write_bytes(data[: len(data) // 2])
    assert lib.ps_flac_info(str(cut).encode(), 0, ctypes.byref(meta)) == 0
    assert meta.total_samples == total  # header still promises everything

    buf = np.zeros(total * meta.num_channels, np.int32)
    got = lib.ps_flac_read(
        str(cut).encode(), 0,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(buf),
    )
    # either a clean decode error or a short-but-valid prefix — never a
    # claimed-full read of a half file
    assert got < total

    # header-only info also works on a file holding ONLY the header bytes
    # (the info path must not require the frame section at all)
    hdr_only = tmp_path / "hdr.flac"
    hdr_only.write_bytes(data[:64])
    assert lib.ps_flac_info(str(hdr_only).encode(), 0, ctypes.byref(meta)) == 0
    assert meta.total_samples == total
