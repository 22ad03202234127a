"""Continuous (slot-based) batch decoding.

The static decoder (inference/generate.py) pads every bucket and waits for
the *longest* sequence in a batch; ragged output lengths leave slots idle.
This module keeps a fixed pool of ``num_slots`` sequences in flight over one
shared KV cache: when a slot emits EOS it is immediately refilled with the
next request's prefill, so the decode matmuls stay at full batch.

Replaces the serving half the reference delegates to HF ``generate``
(ps-slm.py:660-675) with a TPU-native design:

  * one compile for the pool step (``lax.scan`` over ``sync_every``
    single-token steps; per-slot cache write offsets + position ids)
  * one compile for slot insertion (B=1 prefill at a fixed prefill bucket,
    rows copied into the pool cache at the slot index).  The prefill's first
    token rides the pool state (``tok0`` channel) and surfaces in the next
    chunk harvest — inserts never synchronize the host.
  * **pipelined harvest**: chunk k+1 is dispatched before chunk k's tokens
    are pulled, so the device->host sync (expensive on relay backends)
    overlaps the next chunk's compute.  A finished slot decodes at most one
    extra chunk before its refill lands; stale columns are dropped by an
    epoch check.

This module is the greedy pool; beam search gets its own pool in
``inference/continuous_beam.py`` (slot blocks of ``num_beams`` cache rows,
bit-identical to the static ``beam_generate``).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ps_slm_tpu.models import qwen2


def _left_pad_merged(merged, prefill_len: int):
    """Left-pad a merged B=1 prefill to the fixed pool prefill bucket."""
    s = merged.embeds.shape[1]
    if s > prefill_len:
        raise ValueError(
            f"merged length {s} exceeds pool prefill bucket {prefill_len}; "
            "raise prefill_len or the dataset buckets"
        )
    pad = prefill_len - s
    if pad == 0:
        return merged.embeds, merged.attention_mask, merged.position_ids
    embeds = jnp.pad(merged.embeds, ((0, 0), (pad, 0), (0, 0)))
    mask = jnp.pad(merged.attention_mask, ((0, 0), (pad, 0)))
    pos = jnp.pad(merged.position_ids, ((0, 0), (pad, 0)))
    return embeds, mask, pos


# pool = (cache, state); the KV cache is split out so the jitted
# insert/step calls can DONATE it (in-place update, no full-cache copy per
# call) while the small state leaves stay un-donated — some of them
# (tok0_buf/tok0_fresh/active) are also returned as separate outputs that
# the pipelined harvest holds across the next donating call, and donating
# a buffer a live reference still points at would invalidate it.
# state = (full_mask, positions, write_idx, last_tok, active, gen,
#          tok0_buf, tok0_fresh)
def _init_pool(cfg, num_slots: int, capacity: int, eos: int, dtype,
               kv_bits: int = 16):
    return (
        qwen2.init_cache(cfg, num_slots, capacity, dtype=dtype,
                         kv_bits=kv_bits),
        (
            jnp.zeros((num_slots, capacity), bool),
            jnp.zeros((num_slots,), jnp.int32),
            jnp.zeros((num_slots,), jnp.int32),
            jnp.full((num_slots,), eos, jnp.int32),
            jnp.zeros((num_slots,), bool),
            jnp.zeros((num_slots,), jnp.int32),
            jnp.full((num_slots,), eos, jnp.int32),
            jnp.zeros((num_slots,), bool),
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "eos_token_id", "capacity", "k", "kv_bits"),
    donate_argnums=(2,),  # cache only — see the pool-layout comment above
)
def _insert_slots(
    params, cfg, cache, state, slots, embeds, attn_mask, position_ids,
    *, eos_token_id: int, capacity: int, k: int = 1, kv_bits: int = 16,
):
    """Prefill ``k`` requests in ONE forward (B=k) and install each in its
    pool row (grouped refill — B=1 prefills waste the MXU at 1.5B).

    The first generated tokens are kept on device (``tok0`` channel of the
    pool state) — no host sync here.
    """
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

    (full_mask, positions, write_idx, last_tok, active, gen,
     tok0_buf, tok0_fresh) = state
    for i in range(k):
        slot = slots[i]
        cache = {
            key: jax.lax.dynamic_update_slice(
                cache[key], cachek[key][:, i: i + 1],
                (0, slot) + (0,) * (cache[key].ndim - 2),
            )
            for key in cache
        }
        full_mask = jax.lax.dynamic_update_slice(
            full_mask, maskk[i: i + 1], (slot, 0)
        )
        positions = positions.at[slot].set(position_ids[i, -1] + 1)
        write_idx = write_idx.at[slot].set(s)
        last_tok = last_tok.at[slot].set(tok0[i])
        active = active.at[slot].set(tok0[i] != eos_token_id)
        gen = gen.at[slot].set(1)
        tok0_buf = tok0_buf.at[slot].set(tok0[i])
        tok0_fresh = tok0_fresh.at[slot].set(True)
    return cache, (full_mask, positions, write_idx, last_tok, active, gen,
                   tok0_buf, tok0_fresh)


def _merged_rows(model, params, batches):
    """Merge front half (encoder -> posterior -> PSD -> projector -> merge)
    for a list of same-shape B=1 batches in ONE stacked call — every
    front-half op is row-independent.  Non-array payload keys are dropped
    from the stack (batches containing them are grouped as singletons by
    ``_padded_prefills`` and never reach the stacking path)."""
    from types import SimpleNamespace

    from ps_slm_tpu.inference.generate import _merged_fn

    if len(batches) == 1:
        return [_merged_fn(model)(params, batches[0])]
    stacked = {
        key: jnp.concatenate([b[key] for b in batches], axis=0)
        for key in batches[0]
        if hasattr(batches[0][key], "shape")
    }
    m = _merged_fn(model)(params, stacked)
    return [
        SimpleNamespace(
            embeds=m.embeds[i: i + 1],
            attention_mask=m.attention_mask[i: i + 1],
            position_ids=m.position_ids[i: i + 1],
        )
        for i in range(len(batches))
    ]


def _padded_prefills(model, params, rows, prefill_len):
    """Group same-shape B=1 batch dicts, run the front half batched per
    group, left-pad each merged prefill to the pool bucket.  Returns
    ``(embeds, mask, pos)`` tuples aligned with ``rows``.  Shared by the
    greedy/beam/speculative pools — per-request B=1 front halves were the
    pools' dominant refill overhead at 1.5B (docs/PERF.md)."""
    padded = [None] * len(rows)
    groups: Dict[tuple, list] = {}
    for i, batch in enumerate(rows):
        if all(hasattr(v, "shape") for v in batch.values()):
            sig = tuple(sorted(
                (kk, tuple(v.shape)) for kk, v in batch.items()
            ))
        else:
            sig = ("singleton", i)  # non-array payloads: no stacking
        groups.setdefault(sig, []).append(i)
    for idxs in groups.values():
        # power-of-two chunks: the stacked B is part of the jit signature,
        # and ragged refills otherwise compile one front-half program per
        # distinct group size (up to num_slots variants at 1.5B, tens of
        # seconds each) — same bucketing discipline as _insert_slots
        i = 0
        while i < len(idxs):
            k = 1 << ((len(idxs) - i).bit_length() - 1)
            chunk = idxs[i: i + k]
            merged = _merged_rows(model, params, [rows[j] for j in chunk])
            for j, m in zip(chunk, merged):
                padded[j] = _left_pad_merged(m, prefill_len)
            i += k
    return padded


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "eos_token_id", "steps", "max_new_tokens"),
    donate_argnums=(2,),  # cache only — see the pool-layout comment above
)
def _pool_steps(
    params, cfg, cache, state, *,
    eos_token_id: int, steps: int, max_new_tokens: int,
):
    """Run ``steps`` single-token steps over the whole pool.

    Inactive slots are carried masked (their emitted token is EOS and their
    cache/mask/positions stay frozen).  Returns ((cache, state),
    tokens [steps, S], tok0 [S], tok0_fresh [S]) — the tok0 channel reports
    prefill tokens of slots inserted since the last chunk and is cleared in
    the new state.
    """
    (full_mask, positions, write_idx, last_tok, active, gen,
     tok0_buf, tok0_fresh) = state

    def body(carry, _):
        cache, full_mask, positions, write_idx, last_tok, active, gen = carry
        n = full_mask.shape[0]
        rows = jnp.arange(n)
        # expose the about-to-be-written cache cell for active slots
        full_mask = full_mask.at[rows, write_idx].set(
            full_mask[rows, write_idx] | active
        )
        emb = qwen2.embed(params, last_tok[:, None])
        hidden, cache = qwen2.forward(
            params, cfg, emb,
            attention_mask=full_mask,
            position_ids=positions[:, None],
            cache=cache, cache_index=write_idx,
        )
        logits = qwen2.unembed(params, hidden)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(active, nxt, eos_token_id)

        write_idx = write_idx + active.astype(jnp.int32)
        positions = positions + active.astype(jnp.int32)
        gen = gen + active.astype(jnp.int32)
        active = active & (nxt != eos_token_id) & (gen < max_new_tokens)
        carry = (cache, full_mask, positions, write_idx, nxt, active, gen)
        return carry, nxt

    carry = (cache, full_mask, positions, write_idx, last_tok, active, gen)
    carry, toks = jax.lax.scan(body, carry, None, length=steps)
    new_pool = (carry[0], carry[1:] + (tok0_buf, jnp.zeros_like(tok0_fresh)))
    return new_pool, toks, tok0_buf, tok0_fresh


class _SlotPoolBase:
    """Shared run-loop driver for the greedy / beam / speculative pools.

    The pools differ only in what a chunk computes on device and how
    finished slots are harvested; everything protocol-shaped lives here so
    a fix lands once instead of three times:

    * **admission** — pull requests while slots are free.  A ``None`` from
      a live source means "nothing ready right now" (cli/serve.py) and
      hands control back to the step loop instead of blocking admission.
    * **grouped refills** — batched merge front half over same-shape
      requests (``_padded_prefills``) + power-of-two B=k prefill forwards
      (B is part of the jit signature; B=1 prefills waste the MXU at 1.5B).
    * **pipelined harvest** — chunk k+1 is dispatched before chunk k's
      device->host pull, so the sync (expensive on relay backends)
      overlaps the next chunk's compute.  A finished slot decodes at most
      one extra chunk before its refill lands; stale columns are dropped
      by the per-slot epoch check.
    * **provably-done chunk skip** — the host bounds each slot's device
      progress (insert sets 1, each launched chunk adds sync_every): when
      every busy slot provably reached its cap and a harvest is already in
      flight to free them, the next chunk would only churn frozen slots
      and is skipped.  The ``inflight is not None`` guard is load-bearing:
      a slot refilled AFTER the in-flight chunk was dispatched is absent
      from its snapshot and is only freed one iteration later, so a fresh
      slot always gets its chunk on the next pass instead of livelocking
      the skip.

    Subclass hooks: ``_insert_chunk`` (install k prefilled requests),
    ``_reset_slot`` (host bookkeeping for a refilled slot),
    ``_launch_chunk`` (dispatch one pool chunk, return device handles),
    ``_harvest_chunk`` (pull handles, yield finished ``(key, tokens)``),
    and optionally ``_payload_batch`` / ``_prepare_refill`` for payloads
    that carry more than the batch dict (the speculative pool's drafts).
    """

    _supports_stop_after = True
    _supports_stream = True  # token-accumulating pools stream partials;
    #                          beam hypotheses reorder, so it opts out

    # ---- subclass payload hooks -------------------------------------
    def _payload_batch(self, payload):
        """The B=1 batch dict inside a request payload."""
        return payload

    def _prepare_refill(self, slot_req):
        """Pool-specific per-refill data, passed to ``_insert_chunk``."""
        return None

    # ---- shared machinery -------------------------------------------
    def _refill_many(self, slot_req) -> None:
        padded = _padded_prefills(
            self.model, self.params,
            [self._payload_batch(p) for _, _, p in slot_req],
            self.prefill_len,
        )
        extra = self._prepare_refill(slot_req)
        i = 0
        while i < len(slot_req):
            # power-of-two B=k prefills: B is part of the jit signature
            k = 1 << ((len(slot_req) - i).bit_length() - 1)
            chunk, ms = slot_req[i: i + k], padded[i: i + k]
            self.pool = self._insert_chunk(
                jnp.asarray([s for s, _, _ in chunk], jnp.int32),
                jnp.concatenate([e for e, _, _ in ms], axis=0),
                jnp.concatenate([m for _, m, _ in ms], axis=0),
                jnp.concatenate([p for _, _, p in ms], axis=0),
                k=k, extra=extra, offset=i,
            )
            for slot, key, _ in chunk:
                self._reset_slot(slot, key)
                self._epoch[slot] += 1
                self._t_host[slot] = 1  # insert sets device t/gen = 1
                self._emitted_n[slot] = 0
            i += k

    def _finish(self, slot, cap):
        """Free a token-accumulating slot (greedy/spec; beam finalizes on
        device and overrides harvest entirely)."""
        key = self._keys[slot]
        toks = [t for t in self._toks[slot] if t != self.eos][: cap(key)]
        self._keys[slot] = None
        self._toks[slot] = []
        self._free.append(slot)
        return key, np.asarray(toks, np.int32)

    def _emit_partial(self, slot, cap):
        """Stream callback: pass the clean (EOS-free, capped) token prefix
        decoded so far whenever a harvest grew it.  The consumer re-decodes
        the full prefix — byte-level BPE can split one character across
        chunk boundaries, so per-delta text would mojibake."""
        if self._on_partial is None:
            return
        key = self._keys[slot]
        clean = [t for t in self._toks[slot] if t != self.eos][: cap(key)]
        if len(clean) > self._emitted_n[slot]:
            self._emitted_n[slot] = len(clean)
            self._on_partial(key, np.asarray(clean, np.int32))

    def run(
        self, batches: Iterator[Tuple[str, Dict]],
        stop_after: Optional[Dict[str, int]] = None,
        on_partial=None,
    ) -> Iterator[Tuple[str, np.ndarray]]:
        """Decode an iterator of ``(key, payload)`` requests; yields
        ``(key, np.ndarray tokens)`` in completion order (EOS excluded).

        ``stop_after``: optional per-request token cap (app-level early
        stop); the slot frees at the next sync boundary, like a natural
        EOS would.

        ``on_partial``: optional ``(key, token_prefix: np.ndarray) -> None``
        streaming callback, invoked at every harvest that grew a request's
        clean token prefix (greedy/speculative pools only — beam
        hypotheses reorder until finalization, so there is no stable
        prefix to stream).
        """
        if stop_after and not self._supports_stop_after:
            raise ValueError(
                f"{type(self).__name__} does not support stop_after"
            )
        if on_partial is not None and not self._supports_stream:
            raise ValueError(
                f"{type(self).__name__} does not support on_partial "
                "(beam hypotheses have no stable prefix until finalization)"
            )
        self._on_partial = on_partial
        self._emitted_n = [0] * self.num_slots
        batches = iter(batches)
        self._free = list(range(self.num_slots))
        exhausted = False
        inflight = None  # (device payload, busy snapshot)

        def cap(key):
            if stop_after and key in stop_after:
                return max(min(stop_after[key], self.max_new), 1)
            return self.max_new

        while True:
            pending = []
            got_none = False
            while self._free and not exhausted:
                try:
                    item = next(batches)
                except StopIteration:
                    exhausted = True
                    break
                if item is None:
                    # live-source protocol: nothing ready right now — step
                    # the in-flight slots instead of blocking admission
                    got_none = True
                    break
                key, payload = item
                pending.append((self._free.pop(), key, payload))
            if pending:
                self._refill_many(pending)

            busy = [
                i for i in range(self.num_slots)
                if self._keys[i] is not None
            ]
            if not busy and inflight is None:
                if exhausted:
                    return
                if got_none:
                    # defensive: an idle pool over a live source that has
                    # nothing ready must not spin hot on next()
                    time.sleep(0.001)
                continue

            all_done = all(
                self._t_host[i] >= cap(self._keys[i]) for i in busy
            )
            nxt = None
            if busy and not (all_done and inflight is not None):
                payload = self._launch_chunk()
                for i in busy:
                    self._t_host[i] += self.sync_every
                nxt = (
                    payload,
                    [(i, self._keys[i], self._epoch[i]) for i in busy],
                )

            if inflight is not None:
                payload, snapshot = inflight
                yield from self._harvest_chunk(payload, snapshot, cap)

            inflight = nxt


class ContinuousGreedyDecoder(_SlotPoolBase):
    """Slot pool over an iterator of B=1 host batches.

    ``run(batches)`` yields ``(key, np.ndarray tokens)`` in completion order
    (EOS excluded).  ``prefill_len`` is the fixed merged-prefill bucket; all
    requests must bucket at or below it.
    """

    def __init__(
        self, model, params, *,
        num_slots: int = 8,
        prefill_len: int,
        max_new_tokens: int = 200,
        eos_token_id: int,
        sync_every: int = 8,
        kv_bits: int = 16,
    ):
        self.model = model
        self.params = params
        self.cfg = model.llm_cfg
        self.num_slots = num_slots
        self.prefill_len = prefill_len
        self.max_new = max_new_tokens
        self.eos = eos_token_id
        self.sync_every = sync_every
        self.kv_bits = kv_bits
        self.capacity = prefill_len + max_new_tokens
        dtype = params["llm"]["embed_tokens"].dtype
        self.pool = _init_pool(
            self.cfg, num_slots, self.capacity, eos_token_id, dtype,
            kv_bits,
        )
        # host-side per-slot bookkeeping
        self._keys: list = [None] * num_slots
        self._toks: list = [[] for _ in range(num_slots)]
        self._epoch: list = [0] * num_slots
        # tokens a slot will have been OFFERED once every launched chunk is
        # harvested (the prefill contributes 1, each launched chunk up to
        # sync_every).  Once this reaches a slot's cap, the chunks already
        # in flight suffice to finish it (EOS can only finish it sooner),
        # so the run loop can skip launching another chunk for it.
        self._t_host: list = [0] * num_slots

    def _reset_slot(self, slot, key):
        self._keys[slot] = key
        self._toks[slot] = []

    def _insert_chunk(self, slots, embeds, mask, pos, *, k, extra, offset):
        return _insert_slots(
            self.params["llm"], self.cfg, *self.pool,
            slots, embeds, mask, pos,
            eos_token_id=self.eos, capacity=self.capacity, k=k,
            kv_bits=self.kv_bits,
        )

    def _launch_chunk(self):
        self.pool, toks, tok0, fresh = _pool_steps(
            self.params["llm"], self.cfg, *self.pool,
            eos_token_id=self.eos, steps=self.sync_every,
            max_new_tokens=self.max_new,
        )
        return toks, tok0, fresh

    def _harvest_chunk(self, payload, snapshot, cap):
        toks, tok0, fresh = jax.device_get(payload)
        for slot, key, epoch in snapshot:
            if self._keys[slot] != key or self._epoch[slot] != epoch:
                continue  # finished and refilled; stale column
            if fresh[slot]:
                # the prefill token of a slot inserted just before this
                # chunk was dispatched
                self._toks[slot].append(int(tok0[slot]))
            if self._toks[slot] and (
                self._toks[slot][-1] == self.eos
                or len(self._toks[slot]) >= cap(key)
            ):
                yield self._finish(slot, cap)
                continue
            for t in toks[:, slot]:
                self._toks[slot].append(int(t))
                if t == self.eos:
                    break
            self._emit_partial(slot, cap)
            if self._toks[slot][-1] == self.eos or (
                len(self._toks[slot]) >= cap(key)
            ):
                yield self._finish(slot, cap)


def decode_continuous(
    model, params, batches: Iterator[Tuple[str, Dict]], *,
    prefill_len: int, max_new_tokens: int = 200, eos_token_id: int,
    num_slots: int = 8, sync_every: int = 8, kv_bits: int = 16,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Convenience wrapper: decode an iterator of (key, B=1 device batch)."""
    dec = ContinuousGreedyDecoder(
        model, params, num_slots=num_slots, prefill_len=prefill_len,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        sync_every=sync_every, kv_bits=kv_bits,
    )
    return dec.run(batches)
