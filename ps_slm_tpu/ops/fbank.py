"""Kaldi-convention fbank front end + LFR + CMVN + SpecAugment, on device.

TPU-native replacement for the reference's host-side feature stack:
torchaudio ``kaldi.fbank`` (``dataset/speech_dataset_large.py:224-237``) and
the funasr ``WavFrontend`` (LFR m=7/n=6 stacking + global CMVN) that produces
the 560-dim inputs asserted at ``ps-slm.py:426``.  Everything is jittable and
batched: framing -> dither -> DC removal -> preemphasis -> Hamming window ->
512-pt rFFT power spectrum -> Kaldi mel banks -> log -> LFR -> CMVN.

Kaldi conventions implemented (FbankConfig, aispeech_asr_config.py:53-63):
  * snip_edges=True frame count: 1 + (N - frame_len) // frame_shift
  * waveform scaled by 32768 (funasr WavFrontend feeds int16-range floats)
  * remove_dc_offset, preemphasis 0.97 (x[t] - 0.97 x[t-1], x[-1]:=x[0])
  * Hamming window 0.54 - 0.46 cos(2 pi n / (N-1))
  * power spectrum on 512-point FFT, mel banks over bins [0, 256) (Kaldi
    excludes the Nyquist bin), mel scale 1127 ln(1 + f/700)
  * log(max(e, eps)); htk_compat only moves energy (unused: use_energy=False)
  * dither: + dither * N(0,1) per sample, train only (explicit PRNG key)

LFR (funasr apply_lfr): left-pad (m-1)//2 copies of frame 0, stack m frames
every n, repeat the last frame to fill the tail window; T_lfr = ceil(T/n).
CMVN (funasr apply_cmvn, Kaldi am.mvn): x := (x + neg_mean) * inv_stddev.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1.1920928955078125e-07  # torch float32 eps, kaldi log-energy floor


def _mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(
    num_bins: int = 80,
    fft_len: int = 512,
    sample_rate: int = 16000,
    low_freq: float = 0.0,
    high_freq: float = 8000.0,
) -> np.ndarray:
    """Kaldi MelBanks matrix [fft_len//2, num_bins] (Nyquist bin excluded)."""
    if high_freq <= 0:
        high_freq = sample_rate / 2 + high_freq
    num_fft_bins = fft_len // 2
    fft_bin_width = sample_rate / fft_len
    mel_low = _mel(low_freq)
    mel_high = _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_fft_bins, num_bins), np.float32)
    for j in range(num_bins):
        left = mel_low + j * mel_delta
        center = mel_low + (j + 1) * mel_delta
        right = mel_low + (j + 2) * mel_delta
        for i in range(num_fft_bins):
            m = _mel(i * fft_bin_width)
            if left < m < right:
                if m <= center:
                    bins[i, j] = (m - left) / (center - left)
                else:
                    bins[i, j] = (right - m) / (right - center)
    return bins


def _hamming(n: int) -> np.ndarray:
    i = np.arange(n)
    return (0.54 - 0.46 * np.cos(2 * np.pi * i / (n - 1))).astype(np.float32)


def _window(n: int, window_type: str) -> np.ndarray:
    i = np.arange(n)
    if window_type == "hamming":
        return _hamming(n)
    if window_type == "hanning":
        return (0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))).astype(np.float32)
    if window_type == "povey":
        return ((0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))) ** 0.85).astype(
            np.float32
        )
    if window_type == "rectangular":
        return np.ones(n, np.float32)
    raise ValueError(f"unknown window {window_type!r}")


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_mel_bins", "frame_length_ms", "frame_shift_ms", "sample_rate",
        "window_type", "dither", "preemphasis", "remove_dc", "low_freq",
        "high_freq",
    ),
)
def fbank(
    waveform: jnp.ndarray,        # [B, N] float in [-1, 1]
    lengths: jnp.ndarray,         # [B] samples
    key: Optional[jax.Array] = None,
    *,
    num_mel_bins: int = 80,
    frame_length_ms: int = 25,
    frame_shift_ms: int = 10,
    sample_rate: int = 16000,
    window_type: str = "hamming",
    dither: float = 0.0,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
    low_freq: float = 0.0,
    high_freq: float = 8000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Kaldi log-mel fbank. Returns ([B, T, num_mel_bins], frame_lens).

    T is the static frame count of the padded N; per-row validity is
    ``1 + (len - frame_len) // shift`` (0 when len < frame_len).
    """
    b, n = waveform.shape
    frame_len = sample_rate * frame_length_ms // 1000
    shift = sample_rate * frame_shift_ms // 1000
    fft_len = 1 << max(frame_len - 1, 1).bit_length()  # 400 -> 512

    num_frames = max(1 + (n - frame_len) // shift, 0)
    frame_lens = jnp.maximum(
        1 + (lengths - frame_len) // shift, 0
    ).astype(jnp.int32)

    x = waveform.astype(jnp.float32) * 32768.0  # int16 range (funasr)

    idx = (
        jnp.arange(num_frames)[:, None] * shift + jnp.arange(frame_len)[None]
    )  # [T, L]
    frames = x[:, idx]                       # [B, T, L]

    if dither > 0.0 and key is not None:
        frames = frames + dither * jax.random.normal(key, frames.shape)
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis > 0.0:
        first = frames[..., :1]
        prev = jnp.concatenate([first, frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev

    win = jnp.asarray(_window(frame_len, window_type))
    frames = frames * win

    pad = fft_len - frame_len
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    spec = jnp.fft.rfft(frames, n=fft_len, axis=-1)
    power = jnp.square(jnp.abs(spec))[..., : fft_len // 2]  # drop Nyquist

    mel = jnp.asarray(
        mel_banks(num_mel_bins, fft_len, sample_rate, low_freq, high_freq)
    )
    feats = jnp.log(jnp.maximum(power @ mel, EPS))
    return feats, frame_lens


@functools.partial(jax.jit, static_argnames=("m", "n"))
def lfr(
    feats: jnp.ndarray,      # [B, T, D]
    lens: jnp.ndarray,       # [B]
    m: int = 7,
    n: int = 6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Low-frame-rate stacking (funasr apply_lfr): [B,T,D] -> [B,ceil(T/n),D*m].

    Per-row semantics on the *valid* region: left-pad (m-1)//2 copies of
    frame 0, window of m frames every n, tail windows repeat the last valid
    frame.  Static output length uses the padded T.
    """
    b, t, d = feats.shape
    left = (m - 1) // 2
    t_lfr = -(-t // n)  # ceil over the static length
    out_lens = -(-lens // n)

    # per-row gather indices with clamping to [0, len-1] implements both the
    # frame-0 left pad and the last-frame tail repeat
    base = jnp.arange(t_lfr)[:, None] * n + jnp.arange(m)[None] - left  # [T',m]

    def row(fe, ln):
        idx = jnp.clip(base, 0, jnp.maximum(ln - 1, 0))
        return fe[idx].reshape(t_lfr, m * d)

    out = jax.vmap(row)(feats, lens)
    return out, out_lens.astype(jnp.int32)


def load_cmvn(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a Kaldi ``am.mvn`` (text) -> (neg_mean [D], inv_stddev [D]).

    funasr WavFrontend convention: the file stores <AddShift> means and
    <Rescale> vars; applied as (x + neg_mean) * inv_stddev.
    """
    with open(path) as f:
        text = f.read().split()
    arrays = []
    i = 0
    while i < len(text):
        if text[i] == "[":
            j = i + 1
            vals = []
            while text[j] != "]":
                vals.append(float(text[j]))
                j += 1
            arrays.append(np.asarray(vals, np.float32))
            i = j
        i += 1
    if len(arrays) < 2:
        raise ValueError(f"could not parse CMVN stats from {path}")
    # the last two vectors are <AddShift> means and <Rescale> vars (the
    # <Splice> context vector, if present, comes first)
    return arrays[-2], arrays[-1]


def apply_cmvn(feats: jnp.ndarray, neg_mean, inv_std) -> jnp.ndarray:
    return (feats + jnp.asarray(neg_mean)) * jnp.asarray(inv_std)


@functools.partial(
    jax.jit, static_argnames=("num_t_masks", "t_width", "num_f_masks", "f_width")
)
def spec_augment(
    feats: jnp.ndarray,     # [B, T, D]
    lens: jnp.ndarray,      # [B]
    key: jax.Array,
    *,
    num_t_masks: int = 2,
    t_width: int = 50,
    num_f_masks: int = 2,
    f_width: int = 10,
) -> jnp.ndarray:
    """SpecAugment time/freq masking (zero fill), vectorized."""
    b, t, d = feats.shape
    kt, kf = jax.random.split(key)

    def masks(key, count, limit, width, size):
        # limit may be per-row [B,1]: mask starts are drawn inside each
        # row's valid region, not the padded static length — otherwise
        # short utterances in long buckets get mostly no-op masks
        starts = jax.random.randint(key, (b, count), 0, jnp.maximum(limit, 1))
        widths = jax.random.randint(
            jax.random.fold_in(key, 1), (b, count), 0, width + 1
        )
        pos = jnp.arange(size)[None, None, :]
        hit = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
        return jnp.any(hit, axis=1)  # [B, size]

    t_mask = masks(kt, num_t_masks, lens[:, None], t_width, t)
    t_mask = t_mask & (jnp.arange(t)[None] < lens[:, None])
    f_mask = masks(kf, num_f_masks, d, f_width, d)
    out = jnp.where(t_mask[..., None], 0.0, feats)
    return jnp.where(f_mask[:, None, :], 0.0, out)


def frontend(
    waveform: jnp.ndarray,
    lengths: jnp.ndarray,
    key: Optional[jax.Array] = None,
    *,
    cfg=None,
    cmvn: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    train: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full funasr-WavFrontend-equivalent pipeline: fbank -> LFR -> CMVN.

    Produces the [B, T', 560] features the encoder consumes (ps-slm.py:426).
    """
    from ps_slm_tpu.config import FbankConfig

    cfg = cfg or FbankConfig()
    if waveform.dtype == jnp.int16:
        # int16 PCM shipped host->device at half the bytes; the /32768
        # normalization the reference did on host (speech_dataset_large.py:127)
        # happens here so the round trip is bit-exact for 16-bit sources
        waveform = waveform.astype(jnp.float32) / 32768.0
    feats, flens = fbank(
        waveform, lengths,
        key if train else None,
        num_mel_bins=cfg.num_mel_bins,
        frame_length_ms=cfg.frame_length,
        frame_shift_ms=cfg.frame_shift,
        sample_rate=cfg.sample_rate,
        window_type=cfg.window_type,
        dither=cfg.dither if train else 0.0,
        low_freq=float(cfg.low_freq),
        high_freq=float(cfg.high_freq),
    )
    feats, flens = lfr(feats, flens, cfg.lfr_m, cfg.lfr_n)
    if cmvn is not None:
        feats = apply_cmvn(feats, cmvn[0], cmvn[1])
    if train and cfg.specaug and key is not None:
        feats = spec_augment(
            feats, flens, jax.random.fold_in(key, 7),
            num_t_masks=cfg.specaug_t_masks, t_width=cfg.specaug_t_width,
            num_f_masks=cfg.specaug_f_masks, f_width=cfg.specaug_f_width,
        )
    return feats, flens


# ----------------------------------------------------------------------------
# Whisper-style log-mel (dataset's encoder=="whisper" path,
# speech_dataset_large.py:108-118: whisper.pad_or_trim + log_mel_spectrogram)
# ----------------------------------------------------------------------------

def _mel_slaney(num_mels: int, n_fft: int, sr: int) -> np.ndarray:
    """librosa-convention mel filters (slaney scale + slaney norm) used by
    whisper's precomputed mel_filters."""
    fmax = sr / 2
    # slaney mel scale
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
            mel,
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), num_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    weights = np.zeros((num_mels, len(bins)), np.float32)
    for i in range(num_mels):
        lower = (bins - hz[i]) / (hz[i + 1] - hz[i])
        upper = (hz[i + 2] - bins) / (hz[i + 2] - hz[i + 1])
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    # slaney normalization
    enorm = 2.0 / (hz[2: num_mels + 2] - hz[:num_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_fft//2+1, num_mels]


def pad_or_trim(waveform: jnp.ndarray, length: int = 480000) -> jnp.ndarray:
    """whisper.pad_or_trim: fix the last axis to `length` samples (30 s)."""
    n = waveform.shape[-1]
    if n >= length:
        return waveform[..., :length]
    widths = [(0, 0)] * (waveform.ndim - 1) + [(0, length - n)]
    return jnp.pad(waveform, widths)


@functools.partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop"))
def whisper_log_mel(
    waveform: jnp.ndarray,   # [B, 480000] (use pad_or_trim first)
    *,
    n_mels: int = 128,
    n_fft: int = 400,
    hop: int = 160,
) -> jnp.ndarray:
    """whisper.log_mel_spectrogram: centered hann STFT -> slaney mel ->
    log10 -> dynamic-range clamp (max-8) -> (x+4)/4. Returns [B, n_mels, T]."""
    b, n = waveform.shape
    x = waveform.astype(jnp.float32)
    half = n_fft // 2
    x = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")
    num_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(n_fft)[None]
    frames = x[:, idx]                                  # [B, T, n_fft]
    window = jnp.asarray(
        0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    )  # periodic hann (torch.hann_window default)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.square(jnp.abs(spec))[:, :-1, :]        # whisper drops last frame
    mel = jnp.asarray(_mel_slaney(n_mels, n_fft, 16000))
    melspec = power @ mel                                # [B, T-1, n_mels]
    logspec = jnp.log10(jnp.maximum(melspec, 1e-10))
    logspec = jnp.maximum(
        logspec, jnp.max(logspec, axis=(1, 2), keepdims=True) - 8.0
    )
    logspec = (logspec + 4.0) / 4.0
    return jnp.swapaxes(logspec, 1, 2)                   # [B, n_mels, T]
