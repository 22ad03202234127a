"""Golden tests for the TASU core ops: merge, PSD, pseudo-posterior.

Each op is checked against an independent numpy oracle implementing the
behavioral spec of the reference (ps-slm.py:237-317, :337-409, :679-873).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.ops.merge import merge_audio_text
from ps_slm_tpu.ops.psd import psd
from ps_slm_tpu.ops.pseudo_posterior import pseudo_posterior, pseudo_posterior_noise

SPEECH = 99
PAD = 0
IGNORE = -100


# ----------------------------------------------------------------------------
# merge
# ----------------------------------------------------------------------------

def _oracle_merge_row(ids, mask, emb, audio, alen, labels, left):
    """Merged layout for one row, reference semantics, dynamic length."""
    out_emb, out_mask, out_ids, out_labels = [], [], [], []
    for i, tok in enumerate(ids):
        if tok == SPEECH:
            for j in range(alen):
                out_emb.append(audio[j])
                out_mask.append(1)
                out_ids.append(PAD)
                out_labels.append(IGNORE)
        elif mask[i]:
            out_emb.append(emb[i])
            out_mask.append(1)
            out_ids.append(ids[i])
            out_labels.append(labels[i])
        else:
            # pad slot: occupies a position but is not written
            out_emb.append(np.zeros_like(emb[i]))
            out_mask.append(0)
            out_ids.append(PAD)
            out_labels.append(IGNORE)
    return (
        np.array(out_emb), np.array(out_mask),
        np.array(out_ids), np.array(out_labels),
    )


@pytest.mark.parametrize("left", [False, True])
def test_merge_matches_oracle(left):
    rng = np.random.default_rng(0)
    b, s, a, e = 3, 7, 5, 4
    alens = np.array([5, 3, 1])
    audio = rng.normal(size=(b, a, e)).astype(np.float32)

    ids = np.full((b, s), 7, np.int32)
    mask = np.ones((b, s), bool)
    labels = rng.integers(1, 50, size=(b, s)).astype(np.int32)
    # row 0: speech at 2, no padding
    ids[0, 2] = SPEECH
    # row 1: speech at 3, right or left padding of 2
    ids[1, 3] = SPEECH
    if left:
        ids[1] = np.roll(ids[1], 2)
        mask[1, :2] = False
    else:
        mask[1, -2:] = False
    # row 2: speech at 0
    ids[2, 0 if not left else 1] = SPEECH
    if left:
        mask[2, :1] = False

    emb = rng.normal(size=(b, s, e)).astype(np.float32)

    m = merge_audio_text(
        jnp.asarray(audio), jnp.asarray(alens), jnp.asarray(emb),
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels),
        speech_token_id=SPEECH, ignore_id=IGNORE, pad_token_id=PAD,
        left_padding=left,
    )
    out_len = s + a - 1

    for r in range(b):
        oe, om, oi, ol = _oracle_merge_row(
            ids[r], mask[r], emb[r], audio[r], alens[r], labels[r], left
        )
        n = len(om)
        if left:
            # row occupies the tail; validity only on the oracle span
            sl = slice(out_len - n, out_len)
            head = slice(0, out_len - n)
        else:
            sl = slice(0, n)
            head = slice(n, out_len)
        got_mask = np.asarray(m.attention_mask[r])
        np.testing.assert_array_equal(got_mask[sl], om.astype(bool))
        assert not got_mask[head].any()
        got_emb = np.asarray(m.embeds[r])[sl]
        np.testing.assert_allclose(got_emb[om.astype(bool)], oe[om.astype(bool)], rtol=1e-6)
        got_labels = np.asarray(m.labels[r])[sl]
        np.testing.assert_array_equal(
            got_labels[om.astype(bool)], ol[om.astype(bool)]
        )
        got_ids = np.asarray(m.input_ids[r])[sl]
        np.testing.assert_array_equal(got_ids[om.astype(bool)], oi[om.astype(bool)])

    # position ids: cumsum-1 over mask, pads -> 1 (ps-slm.py:871)
    am = np.asarray(m.attention_mask)
    pos = np.asarray(m.position_ids)
    expect = np.cumsum(am, axis=-1) - 1
    np.testing.assert_array_equal(pos[am], expect[am])
    assert (pos[~am] == 1).all()


def test_merge_audio_token_conservation():
    """Total valid positions == text_valid - 1 + audio_len per row
    (the reference raises on violation, ps-slm.py:861-865)."""
    rng = np.random.default_rng(1)
    b, s, a, e = 2, 6, 4, 3
    ids = np.full((b, s), 5, np.int32)
    ids[:, 2] = SPEECH
    mask = np.ones((b, s), bool)
    mask[1, -1:] = False
    alens = np.array([4, 2])
    m = merge_audio_text(
        jnp.asarray(rng.normal(size=(b, a, e)).astype(np.float32)),
        jnp.asarray(alens),
        jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)),
        jnp.asarray(ids), jnp.asarray(mask), None,
        speech_token_id=SPEECH, left_padding=False,
    )
    counts = np.asarray(m.attention_mask).sum(-1)
    expect = mask.sum(-1) - 1 + alens
    np.testing.assert_array_equal(counts, expect)


# ----------------------------------------------------------------------------
# PSD
# ----------------------------------------------------------------------------

def _oracle_psd_row(feats, L, probs, blank_id, thr=0.9):
    """Reference semantics (ps-slm.py:259-301), plain Python."""
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


def test_psd_matches_oracle():
    rng = np.random.default_rng(2)
    b, t, v, d = 3, 24, 6, 5
    blank_id = 0
    # build peaky posteriors so argmax runs exist
    ids = rng.integers(0, v, size=(b, t))
    ids[:, 3:7] = ids[:, 3:4]  # force a run
    probs = np.full((b, t, v), 0.01, np.float32)
    probs[np.arange(b)[:, None], np.arange(t)[None], ids] = 0.95
    # make some blank frames borderline (below threshold) and some above
    probs[0, 5] = 0.0
    probs[0, 5, blank_id] = 0.95  # blank frame above threshold -> dropped
    ids[0, 5] = blank_id
    probs = probs / probs.sum(-1, keepdims=True)
    feats = rng.normal(size=(b, t, d)).astype(np.float32)
    lens = np.array([24, 17, 9])

    out, new_lens = psd(
        jnp.asarray(feats), jnp.asarray(lens), jnp.asarray(probs),
        blank_id=blank_id, blank_threshold=0.9,
    )
    for r in range(b):
        want = _oracle_psd_row(feats[r], lens[r], probs[r], blank_id)
        got = np.asarray(out[r])
        assert int(new_lens[r]) == len(want)
        np.testing.assert_allclose(got[: len(want)], want, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[len(want):], 0.0)


def test_psd_on_posterior_itself():
    """Main TASU audio path pools the posterior by itself (ps-slm.py:471)."""
    rng = np.random.default_rng(3)
    b, t, v = 2, 12, 5
    probs = rng.dirichlet(np.ones(v), size=(b, t)).astype(np.float32)
    lens = np.array([12, 8])
    out, new_lens = psd(
        jnp.asarray(probs), jnp.asarray(lens), jnp.asarray(probs),
        blank_id=0, blank_threshold=0.9,
    )
    for r in range(b):
        want = _oracle_psd_row(probs[r], lens[r], probs[r], 0)
        np.testing.assert_allclose(
            np.asarray(out[r])[: len(want)], want, rtol=1e-5, atol=1e-6
        )


# ----------------------------------------------------------------------------
# pseudo-posterior
# ----------------------------------------------------------------------------

def test_pseudo_posterior_clean():
    ids = jnp.asarray([[3, 1, 2, 0], [4, 4, 0, 0]])
    lens = jnp.asarray([3, 2])
    post, out_lens = pseudo_posterior(ids, lens, vocab_size=6)
    assert post.shape == (2, 4, 6)
    np.testing.assert_array_equal(np.asarray(out_lens), [3, 2])
    p = np.asarray(post)
    # one-hot rows within length
    np.testing.assert_allclose(p[0, 0], np.eye(6)[3])
    np.testing.assert_allclose(p[1, 1], np.eye(6)[4])
    # padding rows are zero
    np.testing.assert_allclose(p[0, 3], 0.0)
    np.testing.assert_allclose(p[1, 2:], 0.0)


def test_pseudo_posterior_noise_statistics():
    """Smoothing + dropping semantics (ps-slm.py:380-399, insert_prob=0)."""
    v, b, l = 8, 64, 16
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, v, size=(b, l)))
    lens = jnp.full((b,), l)
    post, new_lens = pseudo_posterior_noise(
        ids, lens, jax.random.PRNGKey(0), vocab_size=v,
        drop_prob=0.25, smooth_low=0.0, smooth_high=0.1,
    )
    p = np.asarray(post)
    nl = np.asarray(new_lens)
    # drop rate ~25%
    assert 0.6 < nl.mean() / l < 0.9
    for r in range(b):
        # valid rows sum to 1 (smoothed one-hot), padding rows are zero
        np.testing.assert_allclose(p[r, : nl[r]].sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(p[r, nl[r]:], 0.0)
        # each valid row: max = 1-alpha+alpha/v with alpha in [0, 0.1]
        mx = p[r, : nl[r]].max(-1)
        assert (mx > 1 - 0.1).all() and (mx <= 1.0 + 1e-6).all()
        # off-peak entries uniform alpha/v
        off = p[r, : nl[r]].min(-1)
        alpha = (1.0 - mx) / (1.0 - 1.0 / v)
        np.testing.assert_allclose(off, alpha / v, rtol=1e-4, atol=1e-7)


def test_pseudo_posterior_insertion_noise():
    """Insertion semantics (ps-slm.py:388-399): n_ins = floor(n*insert_prob)
    frames, each a blank one-hot or a duplicate of its predecessor."""
    v, b, l, blank = 16, 8, 12, 0
    alpha = 0.08
    rng = np.random.default_rng(5)
    # distinct non-blank ids per row so originals never equal their neighbour
    ids = np.stack([
        rng.permutation(np.arange(1, v))[:l] for _ in range(b)
    ]).astype(np.int32)
    lens = np.full((b,), l, np.int32)
    lens[-1] = 5
    post, new_lens = pseudo_posterior_noise(
        jnp.asarray(ids), jnp.asarray(lens), jax.random.PRNGKey(11),
        vocab_size=v, drop_prob=0.0, insert_prob=0.5,
        smooth_low=alpha, smooth_high=alpha, blank_id=blank,
    )
    p = np.asarray(post)
    nl = np.asarray(new_lens)
    assert p.shape == (b, l + 6, v)  # static budget ceil(12 * 0.5)
    np.testing.assert_array_equal(nl, lens + (lens * 0.5).astype(int))

    blank_onehot = np.eye(v, dtype=np.float32)[blank]
    n_blank = n_dup = 0
    for r in range(b):
        rows = p[r, : nl[r]]
        np.testing.assert_allclose(rows.sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(p[r, nl[r]:], 0.0)
        # classify: inserted blanks are exact one-hots; duplicates copy an
        # original frame (originals are distinct by construction, so any
        # repeated value is an insertion)
        orig_rows = []
        for row in rows:
            if np.allclose(row, blank_onehot):
                n_blank += 1
            elif any(np.allclose(row, o) for o in orig_rows):
                n_dup += 1
            else:
                orig_rows.append(row)
        # surviving originals keep their order and count
        assert len(orig_rows) == lens[r]
        want_ids = [int(np.argmax(x)) for x in orig_rows]
        assert want_ids == list(ids[r, : lens[r]])
    total_ins = int((lens * 0.5).astype(int).sum())
    assert n_blank + n_dup == total_ins
    # dup-vs-blank is a fair coin (96 insertions here)
    assert 0.2 < n_blank / total_ins < 0.8


def test_pseudo_posterior_noise_deterministic():
    ids = jnp.asarray([[1, 2, 3, 4]])
    lens = jnp.asarray([4])
    a, la = pseudo_posterior_noise(ids, lens, jax.random.PRNGKey(7), vocab_size=5)
    b, lb = pseudo_posterior_noise(ids, lens, jax.random.PRNGKey(7), vocab_size=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
