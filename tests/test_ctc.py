"""CTC ops: loss parity vs torch, forced-align vs numpy Viterbi oracle,
greedy decode semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.ops.ctc import (
    ctc_forced_align, ctc_greedy_decode, ctc_loss,
)

torch = pytest.importorskip("torch")


def test_ctc_loss_matches_torch():
    rng = np.random.default_rng(0)
    b, t, v, l = 3, 20, 8, 6
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    logit_lens = np.array([20, 15, 12])
    labels = rng.integers(1, v, size=(b, l)).astype(np.int32)
    label_lens = np.array([6, 4, 3])

    got = float(ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_lens),
        jnp.asarray(labels), jnp.asarray(label_lens), blank_id=0,
    ))

    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    want = torch.nn.functional.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=0, reduction="sum",
        zero_infinity=False,
    ).item() / b
    np.testing.assert_allclose(got, want, rtol=1e-4)


def _oracle_align(log_probs, targets, T, L, blank=0):
    """Numpy Viterbi over the blank-interleaved lattice."""
    ext = [blank]
    for c in targets[:L]:
        ext += [int(c), blank]
    S = len(ext)
    NEG = -1e30
    alpha = np.full(S, NEG)
    alpha[0] = log_probs[0, ext[0]]
    if S > 1:
        alpha[1] = log_probs[0, ext[1]]
    back = np.zeros((T, S), np.int64)
    for t in range(1, T):
        new = np.full(S, NEG)
        for s in range(S):
            cands = [alpha[s]]
            if s >= 1:
                cands.append(alpha[s - 1])
            else:
                cands.append(NEG)
            if s >= 2 and s % 2 == 1 and ext[s] != ext[s - 2]:
                cands.append(alpha[s - 2])
            else:
                cands.append(NEG)
            k = int(np.argmax(cands))
            back[t, s] = k
            new[s] = cands[k] + log_probs[t, ext[s]]
        alpha = new
    end = 2 * L - 1 if alpha[2 * L - 1] >= alpha[2 * L] else 2 * L
    states = [end]
    for t in range(T - 1, 0, -1):
        states.append(states[-1] - back[t, states[-1]])
    states.reverse()
    return np.array([ext[s] for s in states])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forced_align_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    t, v, l = 14, 6, 4
    logits = rng.normal(size=(1, t, v)).astype(np.float32) * 2
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    targets = rng.integers(1, v, size=(1, l)).astype(np.int32)
    # make consecutive targets distinct half the time
    got = np.asarray(ctc_forced_align(
        jnp.asarray(log_probs), jnp.asarray(targets),
        jnp.asarray([t]), jnp.asarray([l]),
    ))[0]
    want = _oracle_align(log_probs[0], targets[0], t, l)
    np.testing.assert_array_equal(got, want)


def test_forced_align_valid_path():
    """Alignment must collapse back to the target sequence."""
    rng = np.random.default_rng(3)
    t, v, l = 20, 7, 5
    log_probs = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(2, t, v)).astype(np.float32)), axis=-1
    ))
    targets = np.stack([
        np.array([1, 2, 2, 3, 4], np.int32),
        np.array([5, 1, 5, 1, 2], np.int32),
    ])
    lens = np.array([t, t - 4])
    tlens = np.array([5, 5])
    align = np.asarray(ctc_forced_align(
        jnp.asarray(log_probs), jnp.asarray(targets),
        jnp.asarray(lens), jnp.asarray(tlens),
    ))
    for r in range(2):
        seq = align[r, : lens[r]]
        collapsed = [x for i, x in enumerate(seq)
                     if x != 0 and (i == 0 or x != seq[i - 1] or
                                    (i > 0 and seq[i - 1] == 0))]
        # collapse repeats separated by blanks properly:
        out = []
        prev = None
        for i, x in enumerate(seq):
            if x != 0 and x != prev:
                out.append(int(x))
            prev = x
        # repeated labels (2,2) are separated by a mandatory blank in CTC
        assert out == list(targets[r][: tlens[r]]), (r, seq, out)


def test_greedy_decode():
    # ids over time: [5 5 0 3 3 0 0 2] -> [5, 3, 2]
    v = 6
    seq = [5, 5, 0, 3, 3, 0, 0, 2]
    logp = np.full((1, len(seq), v), -10.0, np.float32)
    for t, s in enumerate(seq):
        logp[0, t, s] = 0.0
    ids, lens = ctc_greedy_decode(
        jnp.asarray(logp), jnp.asarray([len(seq)])
    )
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(ids)[0, :3], [5, 3, 2])


def test_greedy_decode_respects_length():
    v = 6
    seq = [5, 0, 3, 3, 2, 2]
    logp = np.full((1, len(seq), v), -10.0, np.float32)
    for t, s in enumerate(seq):
        logp[0, t, s] = 0.0
    ids, lens = ctc_greedy_decode(jnp.asarray(logp), jnp.asarray([3]))
    assert int(lens[0]) == 2
    np.testing.assert_array_equal(np.asarray(ids)[0, :2], [5, 3])


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forced_align_matches_reference_source(seed):
    """Viterbi alignment vs the reference's own ctc_forced_align
    (SenseVoice.py:936-1009), executed from the reference source."""
    import sys as _sys
    import os as _os

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    import reference_oracle as ro

    sv = ro.load_ref_sensevoice()
    rng = np.random.default_rng(seed)
    b, t, v = 3, 14, 7
    lens = np.asarray([t, t - 3, t - 6], np.int64)
    tlens = np.asarray([4, 3, 2], np.int64)
    l_max = int(tlens.max())
    targets = np.zeros((b, l_max), np.int64)
    for r in range(b):
        targets[r, : tlens[r]] = rng.integers(1, v, size=tlens[r])
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    log_probs = logits - np.log(
        np.exp(logits).sum(-1, keepdims=True)
    )

    want = sv.ctc_forced_align(
        torch.tensor(log_probs), torch.tensor(targets.copy()),
        torch.tensor(lens), torch.tensor(tlens), blank=0,
    ).numpy()

    got = np.asarray(ctc_forced_align(
        jnp.asarray(log_probs), jnp.asarray(targets.astype(np.int32)),
        jnp.asarray(lens.astype(np.int32)),
        jnp.asarray(tlens.astype(np.int32)), blank=0,
    ))

    def path_score(r, path):
        return float(sum(log_probs[r, i, path[i]] for i in range(len(path))))

    def collapse(path):
        out, prev = [], -1
        for x in path:
            if x != prev and x != 0:
                out.append(int(x))
            prev = x
        return out

    for r in range(b):
        n = int(lens[r])
        if int(tlens[r]) == l_max:
            # unpadded rows: bit-identical to the reference Viterbi
            np.testing.assert_array_equal(got[r, :n], want[r, :n]), r
        else:
            # KNOWN REFERENCE DEVIATION: on rows with target_len < L_max the
            # reference's vendored ctc_forced_align can return a sub-optimal
            # path (verified: its path scores below ours). Require that our
            # path is a valid expansion of the target and at least as
            # probable as the reference's.
            assert collapse(got[r, :n]) == list(targets[r, : tlens[r]]), r
            assert path_score(r, got[r, :n]) >= path_score(r, want[r, :n]) - 1e-5, r
