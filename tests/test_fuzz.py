"""Randomized fuzz: merge + PSD against their oracles over many shapes."""

import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.ops.merge import merge_audio_text
from ps_slm_tpu.ops.psd import psd

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)

SPEECH = 999


def _oracle_merge_row(ids, mask, emb, audio, alen, labels):
    out_emb, out_mask, out_labels = [], [], []
    for i, tok in enumerate(ids):
        if tok == SPEECH:
            for j in range(alen):
                out_emb.append(audio[j])
                out_mask.append(True)
                out_labels.append(-100)
        elif mask[i]:
            out_emb.append(emb[i])
            out_mask.append(True)
            out_labels.append(labels[i])
        else:
            out_emb.append(np.zeros_like(emb[i]))
            out_mask.append(False)
            out_labels.append(-100)
    return np.array(out_emb), np.array(out_mask), np.array(out_labels)


@pytest.mark.parametrize("seed", range(8))
def test_merge_fuzz(seed):
    rng = np.random.default_rng(seed)
    b = int(rng.integers(1, 5))
    s = int(rng.integers(3, 20))
    a = int(rng.integers(1, 16))
    e = int(rng.integers(2, 9))
    left = bool(rng.integers(0, 2))

    ids = rng.integers(1, 50, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), bool)
    for r in range(b):
        pad = int(rng.integers(0, s - 2))
        if left:
            mask[r, :pad] = False
            sp = int(rng.integers(pad, s))
        else:
            if pad:
                mask[r, -pad:] = False
            sp = int(rng.integers(0, s - pad))
        ids[r, sp] = SPEECH
    alens = rng.integers(0, a + 1, size=(b,)).astype(np.int32)
    audio = rng.normal(size=(b, a, e)).astype(np.float32)
    emb = rng.normal(size=(b, s, e)).astype(np.float32)
    labels = rng.integers(1, 50, size=(b, s)).astype(np.int32)

    m = merge_audio_text(
        jnp.asarray(audio), jnp.asarray(alens), jnp.asarray(emb),
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels),
        speech_token_id=SPEECH, left_padding=left,
    )
    out_len = s + a - 1
    for r in range(b):
        oe, om, ol = _oracle_merge_row(
            ids[r], mask[r], emb[r], audio[r], alens[r], labels[r]
        )
        n = len(om)
        sl = slice(out_len - n, out_len) if left else slice(0, n)
        rest = slice(0, out_len - n) if left else slice(n, out_len)
        got_mask = np.asarray(m.attention_mask[r])
        np.testing.assert_array_equal(got_mask[sl], om, err_msg=f"row {r}")
        assert not got_mask[rest].any()
        got_emb = np.asarray(m.embeds[r])[sl]
        np.testing.assert_allclose(got_emb[om], oe[om], rtol=1e-6)
        got_lab = np.asarray(m.labels[r])[sl]
        np.testing.assert_array_equal(got_lab[om], ol[om])


def _oracle_psd_row(feats, L, probs, blank_id=0, thr=0.9):
    if L == 0:
        return np.zeros((0, feats.shape[-1]))
    ids = probs[:L].argmax(-1)
    merged_feats, merged_blank = [], []
    start = 0
    for end in range(1, L + 1):
        if end == L or ids[end] != ids[start]:
            if ids[start] == blank_id:
                for t in range(start, end):
                    merged_feats.append(feats[t])
                    merged_blank.append(probs[t, blank_id])
            else:
                merged_feats.append(feats[start:end].mean(0))
                merged_blank.append(probs[start:end, blank_id].mean())
            start = end
    keep = [f for f, p in zip(merged_feats, merged_blank) if p < thr]
    return np.array(keep) if keep else np.zeros((0, feats.shape[-1]))


@pytest.mark.parametrize("seed", range(8))
def test_psd_fuzz(seed):
    rng = np.random.default_rng(100 + seed)
    b = int(rng.integers(1, 4))
    t = int(rng.integers(4, 40))
    v = int(rng.integers(3, 12))
    d = int(rng.integers(2, 10))
    # peaky posteriors with runs and blanks
    ids = rng.integers(0, v, size=(b, t))
    run = int(rng.integers(1, 5))
    ids[:, : run] = ids[:, :1]
    probs = np.full((b, t, v), 0.01, np.float32)
    probs[np.arange(b)[:, None], np.arange(t)[None], ids] = (
        rng.uniform(0.5, 0.99, size=(b, t)).astype(np.float32)
    )
    probs /= probs.sum(-1, keepdims=True)
    feats = rng.normal(size=(b, t, d)).astype(np.float32)
    lens = rng.integers(0, t + 1, size=(b,)).astype(np.int32)

    out, new_lens = psd(
        jnp.asarray(feats), jnp.asarray(lens), jnp.asarray(probs),
        blank_id=0, blank_threshold=0.9,
    )
    for r in range(b):
        want = _oracle_psd_row(feats[r], lens[r], probs[r])
        assert int(new_lens[r]) == len(want), (r, lens[r])
        got = np.asarray(out[r])
        if len(want):
            np.testing.assert_allclose(
                got[: len(want)], want, rtol=1e-4, atol=1e-5
            )
        np.testing.assert_allclose(got[len(want):], 0.0)
