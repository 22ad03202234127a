"""Speculative slot pool == static greedy per request (fp32 CPU exactness),
with refills, ragged prompts, and mixed draft quality."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.inference.continuous import _left_pad_merged
from ps_slm_tpu.inference.continuous_spec import ContinuousSpeculativeDecoder
from ps_slm_tpu.inference.generate import greedy_generate
from ps_slm_tpu.models import qwen2

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)

EOS = 9
PREFILL = 8
MAX_NEW = 16


def _model(vocab=48, hidden=32):
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


def test_spec_pool_matches_static_greedy():
    cfg, llm = _model()
    reqs = _requests(cfg, llm)

    expected = {}
    for key, merged in reqs:
        emb, mask, pos = _left_pad_merged(merged, PREFILL)
        toks = np.asarray(greedy_generate(
            llm, cfg, emb, mask, pos,
            max_new_tokens=MAX_NEW, eos_token_id=EOS,
        ))[0]
        cut = np.where(toks == EOS)[0]
        expected[key] = toks[: cut[0]] if len(cut) else toks

    # mixed draft quality: oracle, corrupted, empty
    rng = np.random.default_rng(9)
    drafts = {}
    for i, (key, _) in enumerate(reqs):
        base = list(expected[key])
        if i % 3 == 1:
            base = [
                (t + 5) % cfg.vocab_size if rng.random() < 0.4 else t
                for t in base
            ]
        elif i % 3 == 2:
            base = []
        drafts[key] = base

    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]

    dec = ContinuousSpeculativeDecoder(
        model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, window=4,
        draft_max=32, sync_every=2,
    )
    got = dict(dec.run(
        (k, ({"key": k}, drafts[k], len(drafts[k]))) for k, _ in reqs
    ))
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k]), k


def test_spec_pool_oracle_uses_fewer_chunks():
    """With oracle drafts the pool finishes in far fewer chunk dispatches
    than tokens emitted (window acceleration is real, not just correct)."""
    cfg, llm = _model()
    reqs = _requests(cfg, llm, n=2)
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

    import ps_slm_tpu.inference.continuous_spec as cs

    calls = {"n": 0}
    orig = cs._pool_spec_steps

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    cs._pool_spec_steps = counting
    try:
        dec = ContinuousSpeculativeDecoder(
            model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
            max_new_tokens=MAX_NEW, eos_token_id=EOS, window=8,
            draft_max=32, sync_every=1,
        )
        got = dict(dec.run(
            (k, ({"key": k}, list(expected[k]), len(expected[k])))
            for k, _ in reqs
        ))
    finally:
        cs._pool_spec_steps = orig
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k]), k
    total = sum(len(v) for v in expected.values())
    # each chunk is one window forward; oracle drafts emit ~window
    # tokens/chunk/slot, so chunks << tokens
    assert calls["n"] * 8 >= total  # sanity: enough capacity
    assert calls["n"] <= max(4, total // 4), (calls["n"], total)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_pool_fuzz(seed):
    """Randomized slots/windows/sync/draft-quality vs static greedy."""
    rng = np.random.default_rng(100 + seed)
    cfg, llm = _model(vocab=32 + int(rng.integers(0, 32)))
    n = int(rng.integers(3, 7))
    reqs = _requests(cfg, llm, n=n)
    max_new = int(rng.integers(6, 20))

    expected = {}
    for key, merged in reqs:
        emb, mask, pos = _left_pad_merged(merged, PREFILL)
        toks = np.asarray(greedy_generate(
            llm, cfg, emb, mask, pos,
            max_new_tokens=max_new, eos_token_id=EOS,
        ))[0]
        cut = np.where(toks == EOS)[0]
        expected[key] = toks[: cut[0]] if len(cut) else toks

    drafts = {}
    for key in expected:
        base = list(expected[key])
        mode = rng.integers(0, 4)
        if mode == 1:  # corrupted
            base = [
                int((t + rng.integers(1, 5)) % cfg.vocab_size)
                if rng.random() < 0.3 else int(t) for t in base
            ]
        elif mode == 2:  # random garbage
            base = [int(x) for x in rng.integers(0, cfg.vocab_size, 10)]
        elif mode == 3:  # empty
            base = []
        drafts[key] = base

    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]
    dec = ContinuousSpeculativeDecoder(
        model, {"llm": llm},
        num_slots=int(rng.integers(1, 4)),
        prefill_len=PREFILL, max_new_tokens=max_new, eos_token_id=EOS,
        window=int(rng.integers(2, 7)), draft_max=32,
        sync_every=int(rng.integers(1, 4)),
    )
    got = dict(dec.run(
        (k, ({"key": k}, drafts[k], len(drafts[k]))) for k, _ in reqs
    ))
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k]), k


def test_spec_pool_honors_draft_len_on_padded_rows():
    """Drafts may arrive as fixed-width padded arrays with a shorter true
    length; the pool must verify only draft[:draft_len] (the padding is
    NOT draft) and behave exactly like the unpadded call — same outputs,
    same number of chunk dispatches."""
    cfg, llm = _model()
    reqs = _requests(cfg, llm, n=3)
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

    import ps_slm_tpu.inference.continuous_spec as cs

    def run_counting(draft_of):
        calls = {"n": 0}
        orig = cs._pool_spec_steps

        def counting(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        cs._pool_spec_steps = counting
        try:
            dec = ContinuousSpeculativeDecoder(
                model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
                max_new_tokens=MAX_NEW, eos_token_id=EOS, window=4,
                draft_max=32, sync_every=1,
            )
            got = dict(dec.run(
                (k, ({"key": k},) + draft_of(k)) for k, _ in reqs
            ))
        finally:
            cs._pool_spec_steps = orig
        return got, calls["n"]

    # oracle drafts, exact width
    exact, n_exact = run_counting(
        lambda k: (list(expected[k]), len(expected[k]))
    )
    # same drafts zero-padded to a fixed 32-wide row, true length passed
    def padded(k):
        row = np.zeros(32, np.int32)
        row[: len(expected[k])] = expected[k]
        return row, len(expected[k])

    pad, n_pad = run_counting(padded)
    for k in expected:
        np.testing.assert_array_equal(exact[k], expected[k]), k
        np.testing.assert_array_equal(pad[k], expected[k]), k
    assert n_pad == n_exact, (n_pad, n_exact)
