"""Audio IO: wav round-trip, ark:offset seeks, Kaldi matrices, native parity."""

import numpy as np
import pytest

from ps_slm_tpu.data import audio_io as aio


def _tone(n=16000, freq=440.0, rate=16000):
    t = np.arange(n) / rate
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    x = _tone()
    p = tmp_path / "a.wav"
    aio.write_wav(str(p), 16000, x)
    rate, y = aio.read_wav(str(p))
    assert rate == 16000
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_wav_native_vs_numpy(tmp_path):
    p = tmp_path / "a.wav"
    aio.write_wav(str(p), 16000, _tone(5000))
    r1, y1 = aio._read_wav_numpy(str(p), 0)
    r2, y2 = aio.read_wav(str(p), 0)
    assert r1 == r2
    np.testing.assert_array_equal(y1, y2)


def test_wav_ark_offsets(tmp_path):
    p = tmp_path / "w.ark"
    entries = {
        "utt1": (16000, _tone(3000, 440)),
        "utt2": (16000, _tone(4000, 880)),
    }
    offsets = aio.write_kaldi_wav_ark(str(p), entries)
    for key, (rate, x) in entries.items():
        r, y = aio.read_wav(str(p), offsets[key])
        assert r == rate
        np.testing.assert_allclose(y, x, atol=1e-4)
    # load_audio with path:offset syntax (reference manifest convention)
    y = aio.load_audio(f"{p}:{offsets['utt2']}")
    assert len(y) == 4000


def test_kaldi_matrix(tmp_path):
    p = tmp_path / "f.ark"
    mat = np.random.default_rng(0).normal(size=(17, 80)).astype(np.float32)
    with open(p, "wb") as f:
        f.write(b"utt1 ")
        off = f.tell()
        f.write(b"\x00BFM \x04" + np.int32(17).tobytes()
                + b"\x04" + np.int32(80).tobytes())
        f.write(mat.tobytes())
    got = aio.read_kaldi_matrix(str(p), off)
    np.testing.assert_array_equal(got, mat)
    got2 = aio._read_kaldi_matrix_numpy(str(p), off)
    np.testing.assert_array_equal(got2, mat)


def test_flac_missing_file():
    # flac is supported (vendored decoder, data/flac.py); a missing file
    # must surface as FileNotFoundError, not a format error
    with pytest.raises(FileNotFoundError):
        aio.load_audio("x.flac")


def test_resample_path(tmp_path):
    p = tmp_path / "a8k.wav"
    aio.write_wav(str(p), 8000, _tone(8000, 440, 8000))
    y = aio.load_audio(str(p), target_rate=16000)
    assert abs(len(y) - 16000) <= 1


def test_audio_num_samples_matches_load_audio(tmp_path):
    """Header-only lengths must equal len(load_audio(...)) exactly — the
    resume fast-forward (data/dataset.py lazy_audio) relies on identical
    filtering/bucketing decisions."""
    from ps_slm_tpu.data.flac import write_flac

    cases = []
    p = tmp_path / "a.wav"
    aio.write_wav(str(p), 16000, _tone(5000))
    cases.append(str(p))
    p8 = tmp_path / "a8k.wav"  # resample rounding path
    aio.write_wav(str(p8), 8000, _tone(3001, 440, 8000))
    cases.append(str(p8))
    ark = tmp_path / "w.ark"  # path:offset manifest convention
    offsets = aio.write_kaldi_wav_ark(str(ark), {
        "u1": (16000, _tone(3000)),
        "u2": (16000, _tone(4321)),
    })
    cases += [f"{ark}:{offsets['u1']}", f"{ark}:{offsets['u2']}"]
    fp = tmp_path / "a.flac"
    write_flac(str(fp), 16000, _tone(5000))
    cases.append(str(fp))
    f8 = tmp_path / "a8k.flac"
    write_flac(str(f8), 8000, _tone(3001, 440, 8000))
    cases.append(str(f8))
    for path in cases:
        assert aio.audio_num_samples(path) == len(aio.load_audio(path)), path


def test_flac_stream_info(tmp_path):
    from ps_slm_tpu.data.flac import stream_info, write_flac

    fp = tmp_path / "s.flac"
    write_flac(str(fp), 16000, _tone(5000))
    rate, channels, bps, total = stream_info(str(fp))
    assert (rate, channels, bps, total) == (16000, 1, 16, 5000)


def test_native_lib_discovery_env_override(tmp_path, monkeypatch):
    """PS_NATIVE_LIB lets a pip-installed package (no repo-relative
    native/build tree) point at the built helper library."""
    from ps_slm_tpu.data._native_lib import find_native_lib

    monkeypatch.setenv("PS_NATIVE_LIB", str(tmp_path / "missing.so"))
    assert find_native_lib() is None

    fake = tmp_path / "libps_native.so"
    fake.write_bytes(b"")
    monkeypatch.setenv("PS_NATIVE_LIB", str(fake))
    assert find_native_lib() == str(fake)

    monkeypatch.delenv("PS_NATIVE_LIB")
    found = find_native_lib()
    import os
    if os.path.exists(os.path.join(os.path.dirname(__file__), "..", "native", "build", "libps_native.so")):
        assert found is not None and found.endswith("libps_native.so")
