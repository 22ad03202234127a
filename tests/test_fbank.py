"""Front-end tests: Kaldi fbank properties, LFR oracle, CMVN, SpecAugment."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.ops import fbank as fb


def test_frame_count_snip_edges():
    sr = 16000
    n = sr  # 1 s
    wav = jnp.zeros((1, n))
    feats, lens = fb.fbank(wav, jnp.asarray([n]))
    # 1 + (16000-400)//160 = 98 frames/sec (Kaldi snip_edges)
    assert feats.shape[1] == 98
    assert int(lens[0]) == 98


def test_pure_tone_peaks_at_expected_mel_bin():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    for freq in (300.0, 1000.0, 3000.0):
        wav = (0.5 * np.sin(2 * np.pi * freq * t))[None]
        feats, _ = fb.fbank(jnp.asarray(wav), jnp.asarray([sr]))
        mean_spec = np.asarray(feats).mean(axis=(0, 1))
        peak_bin = int(mean_spec.argmax())
        # expected mel bin: mel(freq) mapped into 80 bins over [0, 8000]
        mel = lambda f: 1127 * math.log(1 + f / 700)
        expect = (mel(freq) - mel(0)) / (mel(8000) - mel(0)) * 81 - 1
        assert abs(peak_bin - expect) <= 2, (freq, peak_bin, expect)


def test_mel_banks_rows_sum_positive_and_triangular():
    m = fb.mel_banks(80, 512, 16000, 0, 8000)
    assert m.shape == (256, 80)
    assert (m >= 0).all() and m.max() <= 1.0
    # each filter is contiguous (triangular support)
    for j in range(80):
        nz = np.flatnonzero(m[:, j] > 0)
        assert len(nz) > 0
        assert (np.diff(nz) == 1).all()


def test_dither_deterministic_and_train_only():
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8000)).astype(np.float32))
    lens = jnp.asarray([8000])
    a, _ = fb.fbank(wav, lens, jax.random.PRNGKey(0), dither=1.0)
    b, _ = fb.fbank(wav, lens, jax.random.PRNGKey(0), dither=1.0)
    c, _ = fb.fbank(wav, lens, None, dither=1.0)
    d, _ = fb.fbank(wav, lens, None, dither=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))  # no key -> off
    assert not np.allclose(np.asarray(a), np.asarray(c))


def _oracle_lfr(x, m, n):
    """funasr apply_lfr semantics, plain numpy."""
    t = x.shape[0]
    left = (m - 1) // 2
    t_lfr = -(-t // n)
    padded = np.concatenate([np.repeat(x[:1], left, 0), x], 0)
    out = []
    for i in range(t_lfr):
        if m <= padded.shape[0] - i * n:
            out.append(padded[i * n: i * n + m].reshape(-1))
        else:
            tail = padded[i * n:]
            fill = np.repeat(padded[-1:], m - tail.shape[0], 0)
            out.append(np.concatenate([tail, fill], 0).reshape(-1))
    return np.stack(out)


@pytest.mark.parametrize("t", [6, 7, 13, 20])
def test_lfr_matches_funasr_oracle(t):
    rng = np.random.default_rng(1)
    d, m, n = 4, 7, 6
    x = rng.normal(size=(t, d)).astype(np.float32)
    want = _oracle_lfr(x, m, n)
    got, out_lens = fb.lfr(
        jnp.asarray(x[None]), jnp.asarray([t]), m=m, n=n
    )
    assert int(out_lens[0]) == want.shape[0]
    np.testing.assert_allclose(
        np.asarray(got[0])[: want.shape[0]], want, rtol=1e-6
    )


def test_lfr_static_shape_with_shorter_valid_len():
    """Padded rows: valid region follows the oracle of the *valid* length."""
    rng = np.random.default_rng(2)
    d, m, n, t_pad, t_valid = 3, 7, 6, 30, 14
    x = np.zeros((t_pad, d), np.float32)
    x[:t_valid] = rng.normal(size=(t_valid, d))
    want = _oracle_lfr(x[:t_valid], m, n)
    got, out_lens = fb.lfr(jnp.asarray(x[None]), jnp.asarray([t_valid]), m=m, n=n)
    assert int(out_lens[0]) == want.shape[0]
    np.testing.assert_allclose(
        np.asarray(got[0])[: want.shape[0]], want, rtol=1e-6
    )


def test_cmvn_parse_and_apply(tmp_path):
    p = tmp_path / "am.mvn"
    p.write_text(
        "<Nnet> <Splice> 3 3 [ 0 ] <AddShift> 3 3 <LearnRateCoef> 0 "
        "[ -1.0 -2.0 -3.0 ] <Rescale> 3 3 <LearnRateCoef> 0 [ 0.5 2.0 1.0 ] </Nnet>"
    )
    neg_mean, inv_std = fb.load_cmvn(str(p))
    np.testing.assert_allclose(neg_mean, [-1, -2, -3])
    np.testing.assert_allclose(inv_std, [0.5, 2, 1])
    x = jnp.ones((1, 2, 3))
    y = fb.apply_cmvn(x, neg_mean, inv_std)
    np.testing.assert_allclose(np.asarray(y)[0, 0], [0.0, -2.0, -2.0])


def test_spec_augment_masks_within_bounds():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 40, 8)).astype(np.float32)) + 10.0
    lens = jnp.asarray([40, 25])
    y = fb.spec_augment(
        x, lens, jax.random.PRNGKey(0),
        num_t_masks=2, t_width=5, num_f_masks=1, f_width=2,
    )
    y = np.asarray(y)
    # some zeros appeared, rest unchanged
    zeros = (y == 0.0)
    assert zeros.any()
    changed = ~np.isclose(y, np.asarray(x))
    assert (y[changed] == 0.0).all()


def test_frontend_end_to_end_shapes():
    from ps_slm_tpu.config import FbankConfig

    wav = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 16000)).astype(np.float32) * 0.1
    )
    lens = jnp.asarray([16000, 8000])
    feats, flens = fb.frontend(wav, lens, cfg=FbankConfig())
    assert feats.shape[-1] == 560  # 80 x LFR 7 (ps-slm.py:426)
    # 98 fbank frames -> ceil(98/6) = 17 LFR frames for the 1 s row
    assert int(flens[0]) == 17
    # 48 fbank frames -> ceil(48/6) = 8
    assert int(flens[1]) == 8


def test_whisper_log_mel_properties():
    from ps_slm_tpu.ops.fbank import pad_or_trim, whisper_log_mel

    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.normal(size=(1, 32000)).astype(np.float32) * 0.1)
    padded = pad_or_trim(wav)
    assert padded.shape == (1, 480000)
    mel = whisper_log_mel(padded, n_mels=128)
    assert mel.shape == (1, 128, 3000)  # whisper frame count for 30 s
    m = np.asarray(mel)
    # dynamic range clamp: max - min <= 8/4 = 2 after (x+4)/4 scaling
    assert m.max() - m.min() <= 2.0 + 1e-5
    # trim path
    long = jnp.asarray(rng.normal(size=(1, 500000)).astype(np.float32))
    assert pad_or_trim(long).shape == (1, 480000)


def test_specaug_wiring_in_frontend():
    """specaug=true masks time/freq strips during training only; default off
    (reference carries but disables it, SenseVoice.py:724-725)."""
    import dataclasses

    import jax

    from ps_slm_tpu.config import FbankConfig
    from ps_slm_tpu.ops.fbank import frontend

    rng = np.random.default_rng(11)
    wav = jnp.asarray(rng.normal(size=(2, 16000)).astype(np.float32) * 0.1)
    lens = jnp.asarray([16000, 12000], np.int32)
    cfg_off = FbankConfig(dither=0.0)
    cfg_on = dataclasses.replace(
        cfg_off, specaug=True, specaug_t_masks=2, specaug_t_width=8,
        specaug_f_masks=2, specaug_f_width=40,
    )
    key = jax.random.PRNGKey(0)

    base, bl = frontend(wav, lens, key, cfg=cfg_off, train=True)
    aug, al = frontend(wav, lens, key, cfg=cfg_on, train=True)
    assert base.shape == aug.shape and (np.asarray(bl) == np.asarray(al)).all()
    assert not np.allclose(np.asarray(base), np.asarray(aug))
    # masked entries are exactly zero where base wasn't
    diff = np.asarray(base) != np.asarray(aug)
    assert (np.asarray(aug)[diff] == 0.0).all()
    # eval mode ignores specaug even when enabled
    ev_on, _ = frontend(wav, lens, key, cfg=cfg_on, train=False)
    ev_off, _ = frontend(wav, lens, key, cfg=cfg_off, train=False)
    np.testing.assert_array_equal(np.asarray(ev_on), np.asarray(ev_off))


def test_spec_augment_time_masks_sample_valid_region():
    """Mask starts are drawn inside each row's valid length, not the padded
    static T — a short row in a long bucket must still get real time masks
    (regression: starts over [0, T) made ~90%% of masks land in padding)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 500, 8)).astype(np.float32)) + 10.0
    lens = jnp.asarray([6])
    hits = 0
    for seed in range(20):
        y = np.asarray(fb.spec_augment(
            x, lens, jax.random.PRNGKey(seed),
            num_t_masks=2, t_width=50, num_f_masks=0, f_width=0,
        ))
        if (y[0, :6] == 0.0).any():
            hits += 1
    # start ~ U[0, 6), width ~ U[0, 50]: a mask is a no-op only at width 0,
    # so nearly every draw must touch the valid region (padded-T sampling
    # managed ~2% per mask)
    assert hits >= 15, hits
