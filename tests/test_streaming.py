"""Token streaming from the slot pools (``run(..., on_partial=...)``):
every partial is a prefix of the final output, prefixes grow monotonically,
and the final yield is unchanged by streaming."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.inference.continuous import ContinuousGreedyDecoder
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


def _pool(cfg, llm, reqs, **kw):
    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]
    return ContinuousGreedyDecoder(
        model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, sync_every=3, **kw,
    )


def test_greedy_pool_streams_monotone_prefixes():
    cfg, llm = _model()
    reqs = _requests(cfg, llm)

    partials: dict = {}

    def on_partial(key, prefix):
        prev = partials.setdefault(key, [])
        if prev:
            # monotone growth: the previous prefix is a prefix of this one
            assert len(prefix) > len(prev[-1])
            np.testing.assert_array_equal(prefix[: len(prev[-1])], prev[-1])
        assert EOS not in prefix
        prev.append(np.asarray(prefix))

    dec = _pool(cfg, llm, reqs)
    got = dict(dec.run(
        ((k, {"key": k}) for k, _ in reqs), on_partial=on_partial,
    ))

    # streaming must not change the final outputs
    want = dict(_pool(cfg, llm, reqs).run((k, {"key": k}) for k, _ in reqs))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])

    # every streamed prefix is a prefix of the final output
    for k, seen in partials.items():
        for p in seen:
            np.testing.assert_array_equal(p, got[k][: len(p)])
    # anything longer than one harvest chunk must have streamed
    assert any(len(v) > 0 for v in partials.values())
    for k in want:
        if len(want[k]) > 3:  # > sync_every tokens -> at least one partial
            assert k in partials and len(partials[k]) >= 1


def test_spec_pool_streams_prefixes():
    from ps_slm_tpu.inference.continuous_spec import (
        ContinuousSpeculativeDecoder,
    )

    cfg, llm = _model()
    reqs = _requests(cfg, llm, n=3)
    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]

    def run(on_partial=None):
        dec = ContinuousSpeculativeDecoder(
            model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
            max_new_tokens=MAX_NEW, eos_token_id=EOS, window=4,
            draft_max=8, sync_every=2,
        )
        # empty drafts: pure verification-loop greedy
        return dict(dec.run(
            ((k, ({"key": k}, [], 0)) for k, _ in reqs),
            on_partial=on_partial,
        ))

    partials: dict = {}

    def on_partial(key, prefix):
        prev = partials.setdefault(key, [])
        if prev:
            np.testing.assert_array_equal(prefix[: len(prev[-1])], prev[-1])
        prev.append(np.asarray(prefix))

    got = run(on_partial)
    want = run()
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    for k, seen in partials.items():
        for p in seen:
            np.testing.assert_array_equal(p, got[k][: len(p)])


def test_beam_pool_rejects_on_partial():
    from ps_slm_tpu.inference.continuous_beam import ContinuousBeamDecoder

    cfg, llm = _model()
    reqs = _requests(cfg, llm, n=1)
    model = SimpleNamespace(llm_cfg=cfg)
    model._merged_jit = lambda p, b: dict(reqs)[b["key"]]
    dec = ContinuousBeamDecoder(
        model, {"llm": llm}, num_slots=1, prefill_len=PREFILL,
        max_new_tokens=4, eos_token_id=EOS, num_beams=2,
    )
    with pytest.raises(ValueError, match="on_partial"):
        list(dec.run(
            ((k, {"key": k}) for k, _ in reqs),
            on_partial=lambda k, p: None,
        ))
