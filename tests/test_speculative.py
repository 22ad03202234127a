"""Draft-verified decoding is bit-identical to greedy, regardless of draft
quality; oracle drafts cut the number of LLM forwards by ~window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.inference.generate import greedy_generate
from ps_slm_tpu.inference.speculative import speculative_greedy_generate
from ps_slm_tpu.models import qwen2

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)

EOS = 9
MAX_NEW = 24


def _model(vocab=64, hidden=32):
    cfg = qwen2.Qwen2Config.tiny(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8,
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, params, b=3, s=7):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(b, s))
    mask = np.ones((b, s), bool)
    mask[1, :3] = False  # one left-padded row
    emb = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.clip(jnp.cumsum(jnp.asarray(mask), axis=-1) - 1, 0, None)
    return emb, jnp.asarray(mask), pos


def _expected(params, cfg, emb, mask, pos):
    return np.asarray(greedy_generate(
        params, cfg, emb, mask, pos,
        max_new_tokens=MAX_NEW, eos_token_id=EOS,
    ))


@pytest.mark.parametrize("window", [2, 4, 8])
def test_random_draft_exact(window):
    cfg, params = _model()
    emb, mask, pos = _inputs(cfg, params)
    want = _expected(params, cfg, emb, mask, pos)

    rng = np.random.default_rng(5)
    draft = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(3, 16)), jnp.int32)
    lens = jnp.asarray([16, 10, 0], jnp.int32)  # incl. an empty draft
    got, n_fwd = speculative_greedy_generate(
        params, cfg, emb, mask, pos, draft, lens,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, window=window,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_oracle_draft_exact_and_fewer_forwards():
    cfg, params = _model()
    emb, mask, pos = _inputs(cfg, params)
    want = _expected(params, cfg, emb, mask, pos)

    # oracle draft = the greedy output itself
    draft = jnp.asarray(want, jnp.int32)
    lens = jnp.asarray([
        int((row != EOS).sum()) for row in want
    ], jnp.int32)
    got, n_fwd = speculative_greedy_generate(
        params, cfg, emb, mask, pos, draft, lens,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, window=8,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    # greedy runs one forward per token; the oracle draft needs ~len/8
    longest = int(max((row != EOS).sum() for row in want)) + 1
    assert int(n_fwd) <= max(-(-longest // 8) + 2, 3), (int(n_fwd), longest)


def test_oracle_nonrepetitive_pins_n_forwards(monkeypatch):
    """Regression for the bonus-token cursor bug (ADVICE r2): on a
    NON-repetitive sequence an oracle draft must still accept a full
    window per forward.  Without consuming the draft token matching the
    emitted bonus, every other window mismatches at its first token and
    acceptance collapses toward 1 tok/forward (n_fwd ~12 here instead
    of 4).

    Random-init transformers emit highly repetitive greedy output (which
    is exactly how the bug escaped the oracle test above), so this test
    stubs the model: the prediction after position ``p`` is ``SEQ[p+1]``
    with SEQ built non-repetitive by construction.  Only the speculative
    cursor/window arithmetic is under test."""
    import ps_slm_tpu.inference.speculative as spec_mod

    window, s = 8, 7
    vocab = 64
    # absolute-position sequence: SEQ[i] is the token at position i;
    # period 5 over a disjoint alphabet -> no adjacent repeats anywhere
    seq = jnp.asarray(
        [10 + (i * 3) % 5 for i in range(s + MAX_NEW + window + 2)],
        jnp.int32,
    )
    cfg = qwen2.Qwen2Config.tiny(
        vocab_size=vocab, hidden_size=8, intermediate_size=16,
        num_hidden_layers=1, num_attention_heads=2,
        num_key_value_heads=1, head_dim=4,
    )
    real_params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    params = {"embed_tokens": real_params["embed_tokens"]}

    def fake_forward(params, cfg, emb, *, attention_mask, position_ids,
                     cache, cache_index):
        hidden = jnp.broadcast_to(
            position_ids[:, :, None].astype(jnp.float32),
            (*position_ids.shape, 1),
        )
        return hidden, cache

    def fake_unembed(params, hidden):
        pos = hidden[..., 0].astype(jnp.int32)
        nxt = seq[jnp.clip(pos + 1, 0, seq.shape[0] - 1)]
        return jax.nn.one_hot(nxt, vocab)

    monkeypatch.setattr(spec_mod.qwen2, "forward", fake_forward)
    monkeypatch.setattr(spec_mod.qwen2, "unembed", fake_unembed)

    emb = jnp.zeros((1, s, 8))
    mask = jnp.ones((1, s), bool)
    pos = jnp.arange(s)[None, :]
    want = np.asarray(seq[s : s + MAX_NEW])[None, :]  # no EOS: full budget

    draft = jnp.asarray(want, jnp.int32)
    lens = jnp.asarray([MAX_NEW], jnp.int32)
    got, n_fwd = speculative_greedy_generate(
        params, cfg, emb, mask, pos, draft, lens,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, window=window,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    # prefill emits 1 token; every subsequent forward must emit a full
    # window (accepted draft prefix + bonus)
    expected_fwd = 1 + -(-(MAX_NEW - 1) // window)
    assert int(n_fwd) == expected_fwd, (int(n_fwd), expected_fwd)


def test_corrupted_draft_exact():
    """Substitution errors in the draft lower acceptance, never change
    output (substitution-recovery cursor)."""
    cfg, params = _model()
    emb, mask, pos = _inputs(cfg, params)
    want = _expected(params, cfg, emb, mask, pos)

    draft = np.asarray(want, np.int32).copy()
    rng = np.random.default_rng(11)
    flips = rng.random(draft.shape) < 0.3
    draft = np.where(flips, (draft + 7) % cfg.vocab_size, draft)
    lens = jnp.asarray([MAX_NEW] * 3, jnp.int32)
    got, n_fwd = speculative_greedy_generate(
        params, cfg, emb, mask, pos, jnp.asarray(draft), lens,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, window=4,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
