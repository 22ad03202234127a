"""Decoding tests: greedy-with-cache == full-forward argmax; beam search
sanity; EOS termination; left-padded batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.inference.generate import beam_generate, greedy_generate
from ps_slm_tpu.models import qwen2

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)

EOS = 9


def _model(vocab=32, hidden=32):
    cfg = qwen2.Qwen2Config.tiny(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8,
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _naive_greedy(params, cfg, embeds, mask, pos, max_new, eos):
    """Reference decode: full forward re-run each step, no cache."""
    b = embeds.shape[0]
    cur_emb = embeds
    cur_mask = mask
    cur_pos = pos
    outs = []
    done = np.zeros(b, bool)
    for t in range(max_new):
        hidden, _ = qwen2.forward(
            params, cfg, cur_emb, attention_mask=cur_mask,
            position_ids=cur_pos, use_flash=False,
        )
        logits = np.asarray(qwen2.unembed(params, hidden))[:, -1]
        nxt = logits.argmax(-1).astype(np.int32)
        nxt = np.where(done, eos, nxt)
        outs.append(nxt)
        done |= nxt == eos
        if done.all():
            break
        tok_emb = qwen2.embed(params, jnp.asarray(nxt)[:, None])
        cur_emb = jnp.concatenate([cur_emb, tok_emb], axis=1)
        cur_mask = jnp.concatenate(
            [cur_mask, jnp.ones((b, 1), bool)], axis=1
        )
        cur_pos = jnp.concatenate(
            [cur_pos, (cur_pos[:, -1:] + 1)], axis=1
        )
    out = np.stack(outs, 1)
    pad = np.full((b, max_new - out.shape[1]), eos, np.int32)
    return np.concatenate([out, pad], axis=1)


def _inputs(cfg, params, b=2, s=7, left_pad=(0, 3)):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(b, s))
    mask = np.ones((b, s), bool)
    for r, p in enumerate(left_pad):
        mask[r, :p] = False
    emb = qwen2.embed(params, jnp.asarray(ids))
    pos = jnp.clip(jnp.cumsum(jnp.asarray(mask), axis=-1) - 1, 0, None)
    return emb, jnp.asarray(mask), pos


def test_greedy_matches_naive():
    cfg, params = _model()
    emb, mask, pos = _inputs(cfg, params)
    max_new = 8
    want = _naive_greedy(params, cfg, emb, mask, pos, max_new, EOS)
    got = greedy_generate(
        params, cfg, emb, mask, pos,
        max_new_tokens=max_new, eos_token_id=EOS,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_beam1_matches_greedy():
    cfg, params = _model()
    emb, mask, pos = _inputs(cfg, params)
    g = greedy_generate(
        params, cfg, emb, mask, pos, max_new_tokens=6, eos_token_id=EOS,
    )
    b1 = beam_generate(
        params, cfg, emb, mask, pos, max_new_tokens=6, eos_token_id=EOS,
        num_beams=1,
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b1))


def test_beam_score_not_worse_than_greedy():
    """Beam-4 joint logprob >= greedy joint logprob (same termination)."""
    cfg, params = _model(vocab=24)
    emb, mask, pos = _inputs(cfg, params, b=3, left_pad=(0, 1, 2))
    max_new = 6

    def joint_logprob(seq):
        # score a generated sequence by teacher forcing (full forward)
        b = emb.shape[0]
        cur_emb, cur_mask, cur_pos = emb, mask, pos
        total = np.zeros(b)
        alive = np.ones(b, bool)
        for t in range(seq.shape[1]):
            hidden, _ = qwen2.forward(
                params, cfg, cur_emb, attention_mask=cur_mask,
                position_ids=cur_pos, use_flash=False,
            )
            logp = jax.nn.log_softmax(
                qwen2.unembed(params, hidden)[:, -1].astype(jnp.float32)
            )
            tok = seq[:, t]
            total += np.where(
                alive, np.asarray(logp)[np.arange(b), tok], 0.0
            )
            alive &= tok != EOS
            tok_emb = qwen2.embed(params, jnp.asarray(tok)[:, None])
            cur_emb = jnp.concatenate([cur_emb, tok_emb], 1)
            cur_mask = jnp.concatenate(
                [cur_mask, jnp.ones((b, 1), bool)], 1
            )
            cur_pos = jnp.concatenate([cur_pos, cur_pos[:, -1:] + 1], 1)
        return total

    def hyp_len(seq):
        # generated length incl. the first EOS (HF length-penalty length)
        lens = np.full(seq.shape[0], seq.shape[1], np.float64)
        for r in range(seq.shape[0]):
            hits = np.flatnonzero(seq[r] == EOS)
            if len(hits):
                lens[r] = hits[0] + 1
        return lens

    g = np.asarray(greedy_generate(
        params, cfg, emb, mask, pos, max_new_tokens=max_new, eos_token_id=EOS,
    ))
    bm = np.asarray(beam_generate(
        params, cfg, emb, mask, pos, max_new_tokens=max_new, eos_token_id=EOS,
        num_beams=4,
    ))
    # beam optimizes the length-penalized score logprob / len**1.0
    sg = joint_logprob(g) / hyp_len(g)
    sb = joint_logprob(bm) / hyp_len(bm)
    assert (sb >= sg - 1e-4).all(), (sg, sb)


def test_eos_termination_fill():
    """After a row's first EOS everything is EOS-filled (HF pad semantics)."""
    cfg, params = _model(vocab=12)  # small vocab: EOS appears quickly
    emb, mask, pos = _inputs(cfg, params, b=4, s=5, left_pad=(0, 1, 2, 3))
    out = np.asarray(greedy_generate(
        params, cfg, emb, mask, pos, max_new_tokens=24, eos_token_id=EOS,
        do_sample=True, temperature=2.0,
    ))
    hit_any = False
    for row in out:
        hits = np.flatnonzero(row == EOS)
        if len(hits):
            hit_any = True
            assert (row[hits[0]:] == EOS).all()
    assert hit_any, out


def test_sampling_reproducible():
    cfg, params = _model()
    emb, mask, pos = _inputs(cfg, params)
    a = greedy_generate(
        params, cfg, emb, mask, pos, jax.random.PRNGKey(5),
        max_new_tokens=6, eos_token_id=EOS, do_sample=True, top_p=0.9,
        temperature=0.8,
    )
    b = greedy_generate(
        params, cfg, emb, mask, pos, jax.random.PRNGKey(5),
        max_new_tokens=6, eos_token_id=EOS, do_sample=True, top_p=0.9,
        temperature=0.8,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_repetition_penalty_reduces_repeats():
    cfg, params = _model(vocab=16)
    emb, mask, pos = _inputs(cfg, params, b=2, s=6, left_pad=(0, 2))
    base = np.asarray(greedy_generate(
        params, cfg, emb, mask, pos, max_new_tokens=10, eos_token_id=EOS,
    ))
    pen = np.asarray(greedy_generate(
        params, cfg, emb, mask, pos, max_new_tokens=10, eos_token_id=EOS,
        repetition_penalty=5.0,
    ))

    def max_repeat(row):
        vals, counts = np.unique(row[row != EOS], return_counts=True)
        return counts.max() if len(counts) else 0

    # strong penalty cannot increase the repeat count of the worst row
    assert max(max_repeat(r) for r in pen) <= max(max_repeat(r) for r in base)
    # deterministic + different from base when base repeats
    if max(max_repeat(r) for r in base) > 1:
        assert not np.array_equal(base, pen)


def test_generate_threads_sampling_key():
    """generate() must pass the caller's PRNG key through to the sampler
    (both 'key' and legacy 'rng' spellings): different keys -> different
    samples, same key twice -> identical; no silent PRNGKey(0) reuse."""
    from types import SimpleNamespace

    from ps_slm_tpu.inference.generate import generate

    cfg, params = _model(vocab=64)
    emb, mask, pos = _inputs(cfg, params)
    model = SimpleNamespace(llm_cfg=cfg)
    merged = SimpleNamespace(
        embeds=emb, attention_mask=mask, position_ids=pos,
    )
    model._merged_jit = lambda p, b: merged
    p = {"llm": params}
    kw = dict(
        eos_token_id=EOS, num_beams=1, max_new_tokens=8,
        do_sample=True, temperature=1.5, top_p=1.0,
    )
    a1 = np.asarray(generate(model, p, {}, key=jax.random.PRNGKey(1), **kw))
    a2 = np.asarray(generate(model, p, {}, rng=jax.random.PRNGKey(1), **kw))
    np.testing.assert_array_equal(a1, a2)  # rng alias == key
    outs = [
        np.asarray(generate(
            model, p, {}, key=jax.random.PRNGKey(k), **kw
        ))
        for k in range(2, 8)
    ]
    assert any(not np.array_equal(a1, o) for o in outs), (
        "sampling ignored the provided key"
    )


def test_generate_rejects_knobs_with_draft():
    """The draft-speculative branch is exactly greedy; output-changing
    knobs must raise instead of being silently dropped (API-level twin of
    the CLI validation)."""
    from types import SimpleNamespace

    import pytest as _pytest

    from ps_slm_tpu.inference.generate import generate

    cfg, params = _model()
    emb, mask, pos = _inputs(cfg, params)
    model = SimpleNamespace(llm_cfg=cfg)
    merged = SimpleNamespace(
        embeds=emb, attention_mask=mask, position_ids=pos,
    )
    model._merged_jit = lambda p, b: merged
    p = {"llm": params}
    draft = dict(
        draft_ids=np.zeros((2, 4), np.int32),
        draft_lens=np.zeros((2,), np.int32),
    )
    with _pytest.raises(ValueError, match="bit-identical"):
        generate(model, p, {}, eos_token_id=EOS, num_beams=1,
                 repetition_penalty=1.5, **draft)
    with _pytest.raises(ValueError, match="bit-identical"):
        generate(model, p, {}, eos_token_id=EOS, num_beams=1,
                 do_sample=True, **draft)


def test_speculative_window_1_raises():
    from ps_slm_tpu.inference.speculative import speculative_greedy_generate

    cfg, params = _model()
    emb, mask, pos = _inputs(cfg, params)
    with pytest.raises(ValueError, match="window"):
        speculative_greedy_generate(
            params, cfg, emb, mask, pos,
            jnp.zeros((2, 4), jnp.int32), jnp.zeros((2,), jnp.int32),
            max_new_tokens=4, eos_token_id=EOS, window=1,
        )


def test_default_positions_with_per_row_cache_index():
    """position_ids=None with 1-D (per-row) cache_index — the slot-pool
    layout — must broadcast the offset over S, not crash (regression)."""
    cfg, params = _model()
    b, cap = 2, 8
    nl = cfg.num_hidden_layers
    cache = {
        "k": jnp.zeros((nl, b, cap, cfg.num_key_value_heads, cfg.head_dim),
                       jnp.float32),
        "v": jnp.zeros((nl, b, cap, cfg.num_key_value_heads, cfg.head_dim),
                       jnp.float32),
    }
    idx = jnp.asarray([2, 5], jnp.int32)
    am = jnp.arange(cap)[None, :] <= idx[:, None]
    ids = jnp.asarray([[3], [7]], jnp.int32)
    x = qwen2.embed(params, ids)

    out_default, _ = qwen2.forward(
        params, cfg, x, attention_mask=am, cache=cache, cache_index=idx,
        use_flash=False,
    )
    out_expl, _ = qwen2.forward(
        params, cfg, x, attention_mask=am, position_ids=idx[:, None],
        cache=cache, cache_index=idx, use_flash=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_default), np.asarray(out_expl), rtol=1e-6
    )
