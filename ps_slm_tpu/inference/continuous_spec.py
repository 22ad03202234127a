"""Continuous slot-pool decoding with draft verification per slot.

Composes the two serving paths: the slot pool of inference/continuous.py
(immediate refill on EOS, pipelined harvest) where every pool step is a
draft-verified *window* (inference/speculative.py) instead of a single
token — each LLM forward advances every active slot by up to ``window``
tokens of its own CTC draft.  Per-slot cache write offsets, positions and
draft cursors ride the pool state; output per request is identical to
``speculative_greedy_generate`` (and therefore to greedy decode).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ps_slm_tpu.models import qwen2
from ps_slm_tpu.inference.continuous import _padded_prefills


def _init_pool(cfg, num_slots, capacity, d_max, eos, dtype):
    # pool = (cache, state): the cache is donated into the jitted
    # insert/step calls (in-place update, no full-cache copy per call);
    # the small state leaves stay un-donated because tok0_buf/tok0_fresh
    # are also returned as separate outputs the pipelined harvest holds
    # across the next donating call
    def z():
        return jnp.zeros((num_slots,), jnp.int32)
    return (
        qwen2.init_cache(cfg, num_slots, capacity, dtype=dtype),
        (
            jnp.zeros((num_slots, capacity), bool),  # prefill mask rows
            z(),                                     # positions (next pos)
            z(),                                     # write_idx
            jnp.full((num_slots,), eos, jnp.int32),  # last_tok
            jnp.zeros((num_slots,), bool),           # active
            z(),                                     # gen count
            jnp.zeros((num_slots, max(d_max, 1)), jnp.int32),  # drafts
            z(),                                     # draft lens
            z(),                                     # cursor
            jnp.full((num_slots,), eos, jnp.int32),  # tok0 buffer
            jnp.zeros((num_slots,), bool),           # tok0 fresh
        ),
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "eos_token_id", "capacity", "k"),
    donate_argnums=(2,),  # cache only — see the pool-layout comment above
)
def _insert_slots(
    params, cfg, cache, state, slots, embeds, attn_mask, position_ids,
    draft_rows, draft_lens,
    *, eos_token_id: int, capacity: int, k: int = 1,
):
    """Prefill ``k`` requests in ONE forward (B=k) and install each in its
    pool row with its draft — grouped refill, mirroring
    ``continuous._insert_slots`` (B=1 prefills waste the MXU at 1.5B)."""
    dtype = params["embed_tokens"].dtype
    cachek = qwen2.init_cache(cfg, k, capacity, dtype=dtype)
    s = embeds.shape[1]
    maskk = jnp.zeros((k, capacity), bool).at[:, :s].set(attn_mask)
    hidden, cachek = qwen2.forward(
        params, cfg, embeds.astype(dtype),
        attention_mask=maskk, position_ids=position_ids,
        cache=cachek, cache_index=0,
    )
    tok0 = jnp.argmax(
        qwen2.unembed(params, hidden[:, -1:])[:, 0], axis=-1
    ).astype(jnp.int32)                                     # [k]

    (pmask, positions, write_idx, last_tok, active, gen,
     draft, dlens, cursor, tok0_buf, tok0_fresh) = state
    for i in range(k):
        slot = slots[i]
        cache = {
            key: jax.lax.dynamic_update_slice(
                cache[key], cachek[key][:, i: i + 1], (0, slot, 0, 0, 0)
            )
            for key in ("k", "v")
        }
        pmask = jax.lax.dynamic_update_slice(
            pmask, maskk[i: i + 1], (slot, 0)
        )
        positions = positions.at[slot].set(position_ids[i, -1] + 1)
        write_idx = write_idx.at[slot].set(s)
        last_tok = last_tok.at[slot].set(tok0[i])
        active = active.at[slot].set(tok0[i] != eos_token_id)
        gen = gen.at[slot].set(1)
        draft = draft.at[slot].set(draft_rows[i])
        dlens = dlens.at[slot].set(draft_lens[i])
        # skip draft[0] when it matches the prefill's token
        cursor = cursor.at[slot].set(
            ((draft_rows[i, 0] == tok0[i]) & (draft_lens[i] > 0))
            .astype(jnp.int32)
        )
        tok0_buf = tok0_buf.at[slot].set(tok0[i])
        tok0_fresh = tok0_fresh.at[slot].set(True)
    return cache, (pmask, positions, write_idx, last_tok, active, gen,
                   draft, dlens, cursor, tok0_buf, tok0_fresh)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "eos_token_id", "steps", "max_new_tokens", "window",
        "prefill_len",
    ),
    donate_argnums=(2,),  # cache only — see the pool-layout comment above
)
def _pool_spec_steps(
    params, cfg, cache0, state, *,
    eos_token_id: int, steps: int, max_new_tokens: int, window: int,
    prefill_len: int,
):
    """``steps`` draft-window iterations over the whole pool.

    Returns ((cache, state), toks [steps, S, window], accs [steps, S],
    tok0, fresh).
    """
    (pmask, positions0, write_idx0, last_tok0, active0, gen0,
     draft, dlens, cursor0, tok0_buf, tok0_fresh) = state
    k = window
    n, capacity = pmask.shape
    d_max = draft.shape[1]
    cells = jnp.arange(capacity)[None, :]

    def body(carry, _):
        cache, positions, write_idx, last_tok, active, gen, cursor = carry
        offs = cursor[:, None] + jnp.arange(k - 1)[None, :]
        dtoks = jnp.take_along_axis(
            draft, jnp.clip(offs, 0, max(d_max - 1, 0)), axis=1
        )
        dvalid = (offs < dlens[:, None]) & active[:, None]
        w = jnp.concatenate([last_tok[:, None], dtoks], axis=1)

        kv_mask = pmask | (
            (cells >= prefill_len) & (cells < (write_idx + k)[:, None])
        )
        emb = qwen2.embed(params, w)
        pos_w = positions[:, None] + jnp.arange(k)[None, :]
        hidden, cache = qwen2.forward(
            params, cfg, emb,
            attention_mask=kv_mask, position_ids=pos_w,
            cache=cache, cache_index=write_idx,
        )
        preds = jnp.argmax(
            qwen2.unembed(params, hidden), axis=-1
        ).astype(jnp.int32)

        match = (dtoks == preds[:, :-1]) & dvalid
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)

        o = jnp.arange(k)[None, :]
        bonus = jnp.take_along_axis(preds, m[:, None], axis=1)[:, 0]
        dtoks_p = jnp.pad(dtoks, ((0, 0), (0, 1)))
        emitted = jnp.where(
            o < m[:, None], dtoks_p,
            jnp.where(o == m[:, None], bonus[:, None], eos_token_id),
        )

        acc = m + 1
        is_eos = (emitted == eos_token_id) & (o < acc[:, None])
        first_eos = jnp.where(
            jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1) + 1, acc,
        )
        acc = jnp.minimum(first_eos, acc)
        acc = jnp.minimum(acc, jnp.maximum(max_new_tokens - gen, 0))
        acc = jnp.where(active, acc, 0)

        hit_eos = jnp.any(
            (emitted == eos_token_id) & (o < acc[:, None]), axis=1
        )
        last = jnp.take_along_axis(
            emitted, jnp.maximum(acc - 1, 0)[:, None], axis=1
        )[:, 0]
        new_last = jnp.where(acc > 0, last, last_tok)
        new_gen = gen + acc
        new_active = active & ~hit_eos & (new_gen < max_new_tokens)
        mismatched = (m < (k - 1)) & jnp.take_along_axis(
            dvalid, jnp.minimum(m, max(k - 2, 0))[:, None], axis=1
        )[:, 0]
        # bonus recovery (same as inference/speculative.py): consume the
        # draft token matching the emitted bonus so the next window doesn't
        # re-verify an already-emitted token and collapse acceptance
        bonus_off = cursor + m
        bonus_draft = jnp.take_along_axis(
            draft, jnp.clip(bonus_off, 0, max(d_max - 1, 0))[:, None], axis=1
        )[:, 0]
        bonus_hit = (
            ~mismatched
            & (bonus_off < dlens)
            & (bonus_draft == bonus)
            & (acc == m + 1)
        )
        consumed = jnp.where(
            active,
            m + mismatched.astype(jnp.int32) + bonus_hit.astype(jnp.int32),
            0,
        )

        # mask emitted beyond acc so the host can take rows verbatim
        out_toks = jnp.where(o < acc[:, None], emitted, eos_token_id)
        carry = (
            cache, positions + acc, write_idx + acc, new_last, new_active,
            new_gen, cursor + consumed,
        )
        return carry, (out_toks, acc)

    carry = (
        cache0, positions0, write_idx0, last_tok0, active0, gen0, cursor0,
    )
    carry, (toks, accs) = jax.lax.scan(body, carry, None, length=steps)
    cache, positions, write_idx, last_tok, active, gen, cursor = carry
    new_pool = (
        cache, (pmask, positions, write_idx, last_tok, active, gen,
                draft, dlens, cursor, tok0_buf, jnp.zeros_like(tok0_fresh)),
    )
    return new_pool, toks, accs, tok0_buf, tok0_fresh


class ContinuousSpeculativeDecoder:
    """Slot pool where each step verifies a draft window per slot.

    ``run(batches)`` consumes ``(key, (device_batch, draft_ids, draft_len))``
    tuples — drafts in LLM vocab (e.g. the CTC transcript re-tokenized) —
    and yields ``(key, tokens)`` in completion order.
    """

    def __init__(
        self, model, params, *,
        num_slots: int = 8,
        prefill_len: int,
        max_new_tokens: int = 200,
        eos_token_id: int,
        window: int = 8,
        draft_max: int = 256,
        sync_every: int = 2,
    ):
        self.model = model
        self.params = params
        self.cfg = model.llm_cfg
        self.num_slots = num_slots
        self.prefill_len = prefill_len
        self.max_new = max_new_tokens
        self.eos = eos_token_id
        self.window = window
        self.d_max = draft_max
        self.sync_every = sync_every
        self.capacity = prefill_len + max_new_tokens + window
        dtype = params["llm"]["embed_tokens"].dtype
        self.pool = _init_pool(
            self.cfg, num_slots, self.capacity, draft_max, eos_token_id,
            dtype,
        )
        self._keys: list = [None] * num_slots
        self._toks: list = [[] for _ in range(num_slots)]
        self._epoch: list = [0] * num_slots
        # lower bound on tokens a slot has provably produced (prefill emits
        # 1, each verify forward emits >= 1, so a chunk emits >= sync_every)
        # — lets the run loop skip a chunk that could only churn slots that
        # already hit their cap
        self._t_host: list = [0] * num_slots

    def _refill_many(self, slot_req) -> None:
        """Grouped refill (see ContinuousGreedyDecoder): batched front half
        over same-shape requests + power-of-two B=k prefills, draft rows
        installed alongside.  ``slot_req`` entries are
        ``(slot, key, (batch, draft_ids, draft_len))``; ``draft_len`` is
        honored (drafts may arrive padded wider than their true length)."""
        padded = _padded_prefills(
            self.model, self.params,
            [batch for _, _, (batch, _, _) in slot_req], self.prefill_len,
        )
        rows = np.zeros((len(slot_req), self.d_max), np.int32)
        lens = np.zeros((len(slot_req),), np.int32)
        for i, (_, _, (_, draft, dlen)) in enumerate(slot_req):
            n = min(int(dlen), len(draft), self.d_max)
            rows[i, :n] = np.asarray(draft[:n], np.int32)
            lens[i] = n
        i = 0
        while i < len(slot_req):
            k = 1 << ((len(slot_req) - i).bit_length() - 1)
            chunk, ms = slot_req[i: i + k], padded[i: i + k]
            self.pool = _insert_slots(
                self.params["llm"], self.cfg, *self.pool,
                jnp.asarray([s for s, _, _ in chunk], jnp.int32),
                jnp.concatenate([e for e, _, _ in ms], axis=0),
                jnp.concatenate([m for _, m, _ in ms], axis=0),
                jnp.concatenate([p for _, _, p in ms], axis=0),
                jnp.asarray(rows[i: i + k]), jnp.asarray(lens[i: i + k]),
                eos_token_id=self.eos, capacity=self.capacity, k=k,
            )
            for slot, key, _ in chunk:
                self._keys[slot] = key
                self._toks[slot] = []
                self._epoch[slot] += 1
                self._t_host[slot] = 1  # the prefill token (tok0)
            i += k

    def run(
        self, batches: Iterator[Tuple[str, Tuple[Dict, list]]],
        stop_after: Optional[Dict[str, int]] = None,
    ) -> Iterator[Tuple[str, np.ndarray]]:
        """``stop_after``: optional per-request token cap (app-level early
        stop), like ContinuousGreedyDecoder.run."""
        batches = iter(batches)
        free = list(range(self.num_slots))
        exhausted = False
        inflight = None

        def cap(key):
            if stop_after and key in stop_after:
                return max(min(stop_after[key], self.max_new), 1)
            return self.max_new

        def finish(slot):
            key = self._keys[slot]
            toks = [
                t for t in self._toks[slot] if t != self.eos
            ][: cap(key)]
            self._keys[slot] = None
            self._toks[slot] = []
            free.append(slot)
            return key, np.asarray(toks, np.int32)

        while True:
            pending = []
            got_none = False
            while free and not exhausted:
                try:
                    item = next(batches)
                except StopIteration:
                    exhausted = True
                    break
                if item is None:
                    # live-source protocol (cli/serve.py): nothing ready
                    # right now — step the in-flight slots instead of
                    # blocking admission on a slow request stream
                    got_none = True
                    break
                key, (batch, draft, dlen) = item
                pending.append((free.pop(), key, (batch, draft, dlen)))
            if pending:
                self._refill_many(pending)

            busy = [
                i for i in range(self.num_slots) if self._keys[i] is not None
            ]
            if not busy and inflight is None:
                if exhausted:
                    return
                if got_none:
                    # defensive: an idle pool over a live source that has
                    # nothing ready must not spin hot on next()
                    time.sleep(0.001)
                continue

            # provably-done skip (see ContinuousGreedyDecoder.run): every
            # busy slot at >= cap tokens is inactive on device; if the
            # in-flight harvest will free them, launching another chunk
            # would only churn frozen slots
            all_done = all(
                self._t_host[i] >= cap(self._keys[i]) for i in busy
            )
            nxt = None
            if busy and not (all_done and inflight is not None):
                self.pool, toks, accs, tok0, fresh = _pool_spec_steps(
                    self.params["llm"], self.cfg, *self.pool,
                    eos_token_id=self.eos, steps=self.sync_every,
                    max_new_tokens=self.max_new, window=self.window,
                    prefill_len=self.prefill_len,
                )
                for i in busy:
                    self._t_host[i] += self.sync_every
                snapshot = [(i, self._keys[i], self._epoch[i]) for i in busy]
                nxt = (toks, accs, tok0, fresh, snapshot)

            if inflight is not None:
                toks, accs, tok0, fresh, snapshot = inflight
                toks, accs, tok0, fresh = jax.device_get(
                    (toks, accs, tok0, fresh)
                )
                for slot, key, epoch in snapshot:
                    if self._keys[slot] != key or self._epoch[slot] != epoch:
                        continue
                    if fresh[slot]:
                        self._toks[slot].append(int(tok0[slot]))
                    finished = (
                        self._toks[slot]
                        and self._toks[slot][-1] == self.eos
                    )
                    if not finished:
                        for st in range(toks.shape[0]):
                            for t in toks[st, slot, : accs[st, slot]]:
                                self._toks[slot].append(int(t))
                                if t == self.eos:
                                    finished = True
                                    break
                            if finished:
                                break
                    n_real = len(
                        [t for t in self._toks[slot] if t != self.eos]
                    )
                    if finished or n_real >= cap(key):
                        yield finish(slot)

            inflight = nxt
