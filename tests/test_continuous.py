"""Continuous (slot-based) decoding == per-request static greedy decode."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.inference.continuous import ContinuousGreedyDecoder
from ps_slm_tpu.inference.generate import greedy_generate
from ps_slm_tpu.models import qwen2

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)

EOS = 9
PREFILL = 8
MAX_NEW = 12


def _model(vocab=32, hidden=32):
    cfg = qwen2.Qwen2Config.tiny(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8,
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _requests(cfg, params, n=5):
    """(key, merged-like) pairs with ragged lengths, left-pad semantics."""
    rng = np.random.default_rng(3)
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


def test_continuous_matches_static_greedy():
    cfg, llm = _model()
    reqs = _requests(cfg, llm)

    # expected: static greedy per request, on the identically padded prefill
    from ps_slm_tpu.inference.continuous import _left_pad_merged

    expected = {}
    for key, merged in reqs:
        emb, mask, pos = _left_pad_merged(merged, PREFILL)
        toks = np.asarray(greedy_generate(
            llm, cfg, emb, mask, pos,
            max_new_tokens=MAX_NEW, eos_token_id=EOS,
        ))[0]
        cut = np.where(toks == EOS)[0]
        expected[key] = toks[: cut[0]] if len(cut) else toks

    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]

    dec = ContinuousGreedyDecoder(
        model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, sync_every=3,
    )
    got = dict(dec.run((k, {"key": k}) for k, _ in reqs))

    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k]), k


def test_continuous_prefill_overflow_raises():
    cfg, llm = _model()
    (key, merged), = _requests(cfg, llm, n=1)
    model = SimpleNamespace(llm_cfg=cfg)
    model._merged_jit = lambda p, b: merged
    dec = ContinuousGreedyDecoder(
        model, {"llm": llm}, num_slots=1,
        prefill_len=merged.embeds.shape[1] - 1,
        max_new_tokens=4, eos_token_id=EOS,
    )
    with pytest.raises(ValueError):
        list(dec.run([(key, {"key": key})]))


def test_continuous_stop_after_caps_and_refills():
    """Per-request caps free slots early; outputs equal static greedy
    truncated to the cap."""
    cfg, llm = _model()
    reqs = _requests(cfg, llm, n=4)
    caps = {f"utt{i}": c for i, c in enumerate((2, 5, 1, 3))}

    from ps_slm_tpu.inference.continuous import _left_pad_merged

    expected = {}
    for key, merged in reqs:
        emb, mask, pos = _left_pad_merged(merged, PREFILL)
        toks = np.asarray(greedy_generate(
            llm, cfg, emb, mask, pos,
            max_new_tokens=MAX_NEW, eos_token_id=EOS,
        ))[0]
        cut = np.where(toks == EOS)[0]
        toks = toks[: cut[0]] if len(cut) else toks
        expected[key] = toks[: caps[key]]

    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]
    dec = ContinuousGreedyDecoder(
        model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, sync_every=4,
    )
    got = dict(dec.run(((k, {"key": k}) for k, _ in reqs), stop_after=caps))
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k]), k


def test_continuous_live_source_none_keeps_stepping():
    """Live-source protocol (cli/serve.py): a source yielding ``None`` means
    "nothing ready right now" — the pool must keep stepping in-flight slots
    (and complete them) instead of blocking admission until more requests
    arrive.  Regression: the refill loop used to unconditionally consume
    ``next(batches)``, stalling admitted utterances on a slow stream."""
    cfg, llm = _model()
    reqs = _requests(cfg, llm, n=2)

    from ps_slm_tpu.inference.continuous import _left_pad_merged

    expected = {}
    for key, merged in reqs:
        emb, mask, pos = _left_pad_merged(merged, PREFILL)
        toks = np.asarray(greedy_generate(
            llm, cfg, emb, mask, pos,
            max_new_tokens=MAX_NEW, eos_token_id=EOS,
        ))[0]
        cut = np.where(toks == EOS)[0]
        expected[key] = toks[: cut[0]] if len(cut) else toks

    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]
    dec = ContinuousGreedyDecoder(
        model, {"llm": llm}, num_slots=4, prefill_len=PREFILL,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, sync_every=3,
    )

    flow = {"done": 0, "nones": 0}

    def live_source():
        yield reqs[0][0], {"key": reqs[0][0]}
        # the second request only "arrives" after the first completes;
        # until then the source reports nothing-ready
        while flow["done"] == 0:
            flow["nones"] += 1
            assert flow["nones"] < 1000, "pool stopped making progress"
            yield None
        yield reqs[1][0], {"key": reqs[1][0]}

    got = {}
    for key, toks in dec.run(live_source()):
        flow["done"] += 1
        got[key] = toks

    assert flow["nones"] > 0, "source was never polled while in flight"
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k]), k
