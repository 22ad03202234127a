"""Draft-verified (speculative) greedy decoding.

TASU ships a free draft model: the CTC head's collapsed argmax transcript.
For ASR-style decode the LLM's greedy output largely agrees with the CTC
hypothesis, so instead of one token per forward, the decoder verifies a
window of K draft tokens in a single forward (per-row KV write offsets) and
accepts the longest matching prefix plus the model's own next token —
**bit-identical to greedy decode by construction**, only faster when drafts
match.  On a mismatch the draft cursor skips one token (substitution
recovery — ASR draft errors are mostly substitutions, so alignment
survives; insertions/deletions just lower acceptance, never correctness).

The reference has no analogue (HF greedy, ps-slm.py:660-675); this is a
serving optimization that exact-output tests pin to the static decoder.

Speedup is acceptance-dependent: with an oracle draft the loop runs
~len/K iterations instead of len; with a useless draft it degenerates to
one-token steps at window-K forward cost.  Wire a real CTC transcript (via
SenseVoice BPE decode -> LLM tokenizer encode) as ``draft_ids``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ps_slm_tpu.models import qwen2

NEG_INF = -1e30


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "eos_token_id", "window", "kv_bits",
    ),
)
def speculative_greedy_generate(
    params,
    cfg: qwen2.Qwen2Config,
    inputs_embeds: jnp.ndarray,       # [B, S, H] merged, LEFT-padded
    attention_mask: jnp.ndarray,      # [B, S]
    position_ids: jnp.ndarray,        # [B, S]
    draft_ids: jnp.ndarray,           # [B, D] LLM-vocab draft tokens
    draft_lens: jnp.ndarray,          # [B]
    *,
    max_new_tokens: int = 200,
    eos_token_id: int = 0,
    window: int = 8,
    kv_bits: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode with draft verification.

    Returns (tokens [B, max_new_tokens] EOS-filled, n_forwards scalar —
    the number of LLM forwards actually run, for speedup accounting).
    """
    if window < 2:
        # a 1-token window has no draft lanes (k-1 = 0): the loop would
        # gather from zero-width arrays; the CLIs validate this, the API
        # must too (ADVICE r2)
        raise ValueError("speculative window must be >= 2")
    b, s, _ = inputs_embeds.shape
    k = window
    capacity = s + max_new_tokens + k  # headroom for a partially-used window
    dtype = params["embed_tokens"].dtype
    d_max = draft_ids.shape[1]

    # ---- prefill --------------------------------------------------------
    cache = qwen2.init_cache(cfg, b, capacity, dtype=dtype, kv_bits=kv_bits)
    prefill_mask = jnp.zeros((b, capacity), bool).at[:, :s].set(attention_mask)
    hidden, cache = qwen2.forward(
        params, cfg, inputs_embeds,
        attention_mask=prefill_mask, position_ids=position_ids,
        cache=cache, cache_index=0,
    )
    tok0 = jnp.argmax(
        qwen2.unembed(params, hidden[:, -1:])[:, 0], axis=-1
    ).astype(jnp.int32)

    out = jnp.full((b, max_new_tokens), eos_token_id, jnp.int32)
    out = out.at[:, 0].set(tok0)
    cells = jnp.arange(capacity)[None, :]                  # [1, cap]

    # the draft describes the whole continuation; the prefill already
    # emitted its first token, so skip it when it matches
    cursor0 = (
        (draft_ids[:, 0] == tok0) & (draft_lens > 0)
    ).astype(jnp.int32) if d_max > 0 else jnp.zeros((b,), jnp.int32)

    state = dict(
        cache=cache,
        out=out,
        n_out=jnp.ones((b,), jnp.int32),
        write_idx=jnp.full((b,), s, jnp.int32),
        pos=position_ids[:, -1] + 1,
        cursor=cursor0,
        last_tok=tok0,
        done=tok0 == eos_token_id,
        n_fwd=jnp.ones((), jnp.int32),
    )

    def cond(st):
        return jnp.any(~st["done"])

    def body(st):
        cache = st["cache"]
        # window = [last_tok, draft[cursor : cursor+k-1]]
        offs = st["cursor"][:, None] + jnp.arange(k - 1)[None, :]
        dtoks = jnp.take_along_axis(
            draft_ids, jnp.clip(offs, 0, max(d_max - 1, 0)), axis=1
        )
        dvalid = offs < draft_lens[:, None]                # [B, k-1]
        w = jnp.concatenate([st["last_tok"][:, None], dtoks], axis=1)

        kv_mask = prefill_mask | (
            (cells >= s) & (cells < (st["write_idx"] + k)[:, None])
        )
        emb = qwen2.embed(params, w)
        positions = st["pos"][:, None] + jnp.arange(k)[None, :]
        hidden, cache = qwen2.forward(
            params, cfg, emb,
            attention_mask=kv_mask, position_ids=positions,
            cache=cache, cache_index=st["write_idx"],
        )
        preds = jnp.argmax(
            qwen2.unembed(params, hidden), axis=-1
        ).astype(jnp.int32)                                # [B, k]

        # longest verified draft prefix: draft token i accepted iff all
        # tokens 0..i matched the model's argmax and were in-bounds
        match = (dtoks == preds[:, :-1]) & dvalid          # [B, k-1]
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)

        # emitted sequence: accepted draft tokens then the model's token
        o = jnp.arange(k)[None, :]
        bonus = jnp.take_along_axis(preds, m[:, None], axis=1)[:, 0]
        dtoks_p = jnp.pad(dtoks, ((0, 0), (0, 1)))         # [B, k]
        emitted = jnp.where(
            o < m[:, None], dtoks_p,
            jnp.where(o == m[:, None], bonus[:, None], eos_token_id),
        )

        # truncate at the first EOS and at the max_new budget
        acc = m + 1
        is_eos = (emitted == eos_token_id) & (o < acc[:, None])
        first_eos = jnp.where(
            jnp.any(is_eos, axis=1),
            jnp.argmax(is_eos, axis=1) + 1, acc,
        )
        acc = jnp.minimum(first_eos, acc)
        budget = max_new_tokens - st["n_out"]
        acc = jnp.minimum(acc, budget)
        acc = jnp.where(st["done"], 0, acc)

        # scatter emitted[0:acc] into out at n_out
        j = jnp.arange(max_new_tokens)[None, :]
        rel = j - st["n_out"][:, None]
        take = (rel >= 0) & (rel < acc[:, None])
        gathered = jnp.take_along_axis(
            emitted, jnp.clip(rel, 0, k - 1), axis=1
        )
        new_out = jnp.where(take, gathered, st["out"])

        new_n_out = st["n_out"] + acc
        hit_eos = jnp.any(
            (emitted == eos_token_id) & (o < acc[:, None]), axis=1
        )
        new_done = st["done"] | hit_eos | (new_n_out >= max_new_tokens)
        last = jnp.take_along_axis(
            emitted, jnp.maximum(acc - 1, 0)[:, None], axis=1
        )[:, 0]
        new_last = jnp.where(acc > 0, last, st["last_tok"])

        # substitution recovery: consume the mismatched draft token too —
        # but only on a genuine mismatch (a fully-matched window has no
        # rejected token to skip)
        mismatched = (m < (k - 1)) & jnp.take_along_axis(
            dvalid, jnp.minimum(m, max(k - 2, 0))[:, None], axis=1
        )[:, 0]
        # bonus recovery: the emitted bonus token ends the window, and when
        # the draft's next token equals it (always true for an oracle draft
        # after a fully-matched window) that draft token is already spoken
        # for — consume it so the next window doesn't re-verify it and
        # mismatch (without this, acceptance collapses to ~1 tok/forward on
        # non-repetitive text)
        bonus_off = st["cursor"] + m
        if d_max > 0:
            bonus_draft = jnp.take_along_axis(
                draft_ids, jnp.clip(bonus_off, 0, d_max - 1)[:, None], axis=1
            )[:, 0]
        else:
            bonus_draft = jnp.full_like(bonus, -1)
        bonus_hit = (
            ~mismatched
            & (bonus_off < draft_lens)
            & (bonus_draft == bonus)
            & (acc == m + 1)  # the bonus was actually emitted
        )
        consumed = m + mismatched.astype(jnp.int32) + bonus_hit.astype(
            jnp.int32
        )
        return dict(
            cache=cache,
            out=new_out,
            n_out=new_n_out,
            write_idx=st["write_idx"] + acc,
            pos=st["pos"] + acc,
            cursor=st["cursor"] + consumed,
            last_tok=new_last,
            done=new_done,
            n_fwd=st["n_fwd"] + 1,
        )

    state = jax.lax.while_loop(cond, body, state)
    return state["out"], state["n_fwd"]
