"""Continuous beam pool == per-request static beam_generate (bit-exact)."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.inference.continuous import _left_pad_merged
from ps_slm_tpu.inference.continuous_beam import ContinuousBeamDecoder
from ps_slm_tpu.inference.generate import beam_generate
from ps_slm_tpu.models import qwen2

pytestmark = pytest.mark.slow  # compile-heavy

EOS = 9
PREFILL = 8
MAX_NEW = 10


def _model(vocab=32, hidden=32, seed=0):
    cfg = qwen2.Qwen2Config.tiny(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8,
    )
    params = qwen2.init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def _requests(cfg, params, n=5, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        s = int(rng.integers(4, PREFILL + 1))
        ids = rng.integers(0, cfg.vocab_size, size=(1, s))
        emb = qwen2.embed(params, jnp.asarray(ids))
        mask = jnp.ones((1, s), bool)
        pos = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0, None)
        out.append((f"utt{i}", SimpleNamespace(
            embeds=emb, attention_mask=mask, position_ids=pos,
        )))
    return out


def _expected(cfg, llm, reqs, length_penalty=1.0, num_beams=4):
    out = {}
    for key, merged in reqs:
        emb, mask, pos = _left_pad_merged(merged, PREFILL)
        toks = np.asarray(beam_generate(
            llm, cfg, emb, mask, pos,
            max_new_tokens=MAX_NEW, eos_token_id=EOS, num_beams=num_beams,
            length_penalty=length_penalty,
        ))[0]
        out[key] = toks[toks != EOS]
    return out


@pytest.mark.parametrize("length_penalty", [1.0, 0.6, -0.5])
def test_beam_pool_matches_static_beam(length_penalty):
    # -0.5 pins the early-exit bound for negative penalties (divisor
    # maximized at the SHORTEST achievable length, not max_new)
    cfg, llm = _model()
    reqs = _requests(cfg, llm)
    expected = _expected(cfg, llm, reqs, length_penalty)

    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]

    dec = ContinuousBeamDecoder(
        model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, num_beams=4,
        length_penalty=length_penalty, sync_every=3,
    )
    got = dict(dec.run((k, {"key": k}) for k, _ in reqs))
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k], err_msg=k)


def test_beam_pool_many_requests_few_slots():
    """More requests than slots: every request answered once, all exact."""
    cfg, llm = _model(seed=4)
    reqs = _requests(cfg, llm, n=9, seed=11)
    expected = _expected(cfg, llm, reqs)

    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]

    dec = ContinuousBeamDecoder(
        model, {"llm": llm}, num_slots=3, prefill_len=PREFILL,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, num_beams=4,
        sync_every=4,
    )
    got = dict(dec.run((k, {"key": k}) for k, _ in reqs))
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k], err_msg=k)


def test_provably_done_chunk_skip(monkeypatch):
    """When every busy slot's host-side t bound hits max_new and a harvest
    is in flight, the run loop must NOT launch the terminal all-frozen
    chunk (launch count = ceil((max_new-1)/sync_every), not +1)."""
    import ps_slm_tpu.inference.continuous_beam as cb

    cfg, llm = _model(vocab=33)  # EOS=vocab+  never emitted -> no early exit
    eos = cfg.vocab_size  # out-of-vocab: beams never bank, t runs to max_new
    reqs = _requests(cfg, llm, n=2)
    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]

    calls = []
    orig = cb._pool_steps

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(cb, "_pool_steps", counting)
    max_new, sync = 9, 4
    dec = ContinuousBeamDecoder(
        model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
        max_new_tokens=max_new, eos_token_id=eos, num_beams=4,
        sync_every=sync,
    )
    got = dict(dec.run((k, {"key": k}) for k, _ in reqs))
    assert set(got) == {k for k, _ in reqs}
    for toks in got.values():
        assert len(toks) == max_new  # no EOS ever emitted
    # insert sets t=1; two 4-step chunks reach t=9=max_new; the third
    # (all-frozen) chunk is provably useless and must be skipped
    assert len(calls) == 2, calls
