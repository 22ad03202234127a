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

import jax
import jax.numpy as jnp
import numpy as np

from ps_slm_tpu.models import qwen2
from ps_slm_tpu.inference.continuous import _SlotPoolBase


def _init_pool(cfg, num_slots, capacity, d_max, eos, dtype,
               kv_bits: int = 16):
    # pool = (cache, state): the cache is donated into the jitted
    # insert/step calls (in-place update, no full-cache copy per call);
    # the small state leaves stay un-donated because tok0_buf/tok0_fresh
    # are also returned as separate outputs the pipelined harvest holds
    # across the next donating call
    def z():
        return jnp.zeros((num_slots,), jnp.int32)
    return (
        qwen2.init_cache(cfg, num_slots, capacity, dtype=dtype,
                         kv_bits=kv_bits),
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
    jax.jit,
    static_argnames=("cfg", "eos_token_id", "capacity", "k", "kv_bits"),
    donate_argnums=(2,),  # cache only — see the pool-layout comment above
)
def _insert_slots(
    params, cfg, cache, state, slots, embeds, attn_mask, position_ids,
    draft_rows, draft_lens,
    *, eos_token_id: int, capacity: int, k: int = 1, kv_bits: int = 16,
):
    """Prefill ``k`` requests in ONE forward (B=k) and install each in its
    pool row with its draft — grouped refill, mirroring
    ``continuous._insert_slots`` (B=1 prefills waste the MXU at 1.5B)."""
    dtype = params["embed_tokens"].dtype
    cachek = qwen2.init_cache(cfg, k, capacity, dtype=dtype, kv_bits=kv_bits)
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
                cache[key], cachek[key][:, i: i + 1],
                (0, slot) + (0,) * (cache[key].ndim - 2),
            )
            for key in cache
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


class ContinuousSpeculativeDecoder(_SlotPoolBase):
    """Slot pool where each step verifies a draft window per slot.

    ``run(batches)`` consumes ``(key, (device_batch, draft_ids, draft_len))``
    tuples — drafts in LLM vocab (e.g. the CTC transcript re-tokenized) —
    and yields ``(key, tokens)`` in completion order.  Run-loop protocol
    (admission, grouped refills, pipelined harvest, provably-done skip)
    lives in ``continuous._SlotPoolBase``.
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
        kv_bits: int = 16,
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
        self.kv_bits = kv_bits
        self.capacity = prefill_len + max_new_tokens + window
        dtype = params["llm"]["embed_tokens"].dtype
        self.pool = _init_pool(
            self.cfg, num_slots, self.capacity, draft_max, eos_token_id,
            dtype, kv_bits,
        )
        self._keys: list = [None] * num_slots
        self._toks: list = [[] for _ in range(num_slots)]
        self._epoch: list = [0] * num_slots
        # lower bound on tokens a slot has provably produced (prefill emits
        # 1, each verify forward emits >= 1, so a chunk emits >= sync_every)
        # — lets the run loop skip a chunk that could only churn slots that
        # already hit their cap
        self._t_host: list = [0] * num_slots

    def _payload_batch(self, payload):
        batch, _, _ = payload
        return batch

    def _prepare_refill(self, slot_req):
        """Draft rows/lens for the whole refill; ``draft_len`` is honored
        (drafts may arrive padded wider than their true length)."""
        rows = np.zeros((len(slot_req), self.d_max), np.int32)
        lens = np.zeros((len(slot_req),), np.int32)
        for i, (_, _, (_, draft, dlen)) in enumerate(slot_req):
            n = min(int(dlen), len(draft), self.d_max)
            rows[i, :n] = np.asarray(draft[:n], np.int32)
            lens[i] = n
        return rows, lens

    def _reset_slot(self, slot, key):
        self._keys[slot] = key
        self._toks[slot] = []

    def _insert_chunk(self, slots, embeds, mask, pos, *, k, extra, offset):
        rows, lens = extra
        return _insert_slots(
            self.params["llm"], self.cfg, *self.pool,
            slots, embeds, mask, pos,
            jnp.asarray(rows[offset: offset + k]),
            jnp.asarray(lens[offset: offset + k]),
            eos_token_id=self.eos, capacity=self.capacity, k=k,
            kv_bits=self.kv_bits,
        )

    def _launch_chunk(self):
        self.pool, toks, accs, tok0, fresh = _pool_spec_steps(
            self.params["llm"], self.cfg, *self.pool,
            eos_token_id=self.eos, steps=self.sync_every,
            max_new_tokens=self.max_new, window=self.window,
            prefill_len=self.prefill_len,
        )
        return toks, accs, tok0, fresh

    def _harvest_chunk(self, payload, snapshot, cap):
        toks, accs, tok0, fresh = jax.device_get(payload)
        for slot, key, epoch in snapshot:
            if self._keys[slot] != key or self._epoch[slot] != epoch:
                continue  # finished and refilled; stale column
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
            self._emit_partial(slot, cap)
            n_real = len(
                [t for t in self._toks[slot] if t != self.eos]
            )
            if finished or n_real >= cap(key):
                yield self._finish(slot, cap)
