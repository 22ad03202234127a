"""Continuous (slot-pool) BEAM decoding.

The reference's default decode is beam-4 (ps-slm.py:660-675), so beam must
be a first-class serving path, not only the static ``beam_generate``.
This pool keeps ``num_slots`` independent beam searches in flight over one
shared KV cache: slot *i*'s ``num_beams`` hypotheses occupy cache rows
``[i*bm, (i+1)*bm)``; every pool step advances all slots one token with
full HF beam semantics (2*bm expansion, top-bm EOS banking, length-penalty
scoring — identical math to ``inference/generate.py::beam_generate``).

Raggedness comes from a **provably outcome-identical early exit**: a slot
is done when its finished-hypothesis bank is full AND the most optimistic
future score of any alive beam — current best raw score (log-probs only
ever decrease) divided by the largest possible length penalty
``max_new**lp`` — cannot beat the worst banked score.  The final
``finalize`` step still banks alive beams at full length exactly like the
static decoder, so output per request is bit-identical to
``beam_generate`` by construction (pinned in tests/test_continuous_beam.py).

Same pipelined-harvest protocol as ContinuousGreedyDecoder; finished slots
are finalized on device and refilled immediately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ps_slm_tpu.models import qwen2
from ps_slm_tpu.inference.continuous import _SlotPoolBase

NEG_INF = -1e30


# pool = (cache, state); the KV cache ([L, S*bm, cap, kv_heads, hd] per
# qwen2.init_cache — capacity is axis 2) is split out so the jitted
# insert/step calls can DONATE it (in-place update, no full-cache copy per
# call) while the small state leaves stay un-donated — ``active`` is also
# returned as a separate output that the pipelined harvest holds across
# the next donating call, and donating a buffer a live reference still
# points at would invalidate it.
#   state = (pmask[S*bm, cap], positions[S],
#    write_idx[S], tokens[S, bm], scores[S, bm], seqs[S, bm, max_new],
#    t[S], active[S], fin_seqs[S, bm, max_new], fin_scores[S, bm],
#    fin_valid[S, bm])
def _init_pool(cfg, num_slots, bm, capacity, max_new, eos, dtype,
               kv_bits: int = 16):
    def zs():
        return jnp.zeros((num_slots,), jnp.int32)
    return (
        qwen2.init_cache(cfg, num_slots * bm, capacity, dtype=dtype,
                         kv_bits=kv_bits),
        (
            jnp.zeros((num_slots * bm, capacity), bool),
            zs(),
            zs(),
            jnp.full((num_slots, bm), eos, jnp.int32),
            jnp.full((num_slots, bm), NEG_INF, jnp.float32),
            jnp.full((num_slots, bm, max_new), eos, jnp.int32),
            zs(),
            jnp.zeros((num_slots,), bool),
            jnp.full((num_slots, bm, max_new), eos, jnp.int32),
            jnp.full((num_slots, bm), NEG_INF, jnp.float32),
            jnp.zeros((num_slots, bm), bool),
        ),
    )


def _bank(fin_seqs, fin_scores, fin_valid, cand_seqs, cand_scores, newly):
    """Insert newly-finished candidates, keep best bm (per leading axis).

    Same math as beam_generate's bank (generate.py:241-254)."""
    bm = fin_scores.shape[-1]
    all_scores = jnp.concatenate(
        [fin_scores, jnp.where(newly, cand_scores, NEG_INF)], axis=-1
    )
    all_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=-2)
    all_valid = jnp.concatenate([fin_valid, newly], axis=-1)
    top, idx = jax.lax.top_k(all_scores, bm)
    g = jnp.take_along_axis
    return (
        g(all_seqs, idx[..., None], axis=-2),
        top,
        g(all_valid, idx, axis=-1),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "eos_token_id", "capacity", "num_beams",
                     "max_new_tokens", "length_penalty", "k", "kv_bits"),
    donate_argnums=(2,),  # cache only — see the pool-layout comment above
)
def _insert_slots(
    params, cfg, cache, state, slots, embeds, attn_mask, position_ids,
    *, eos_token_id: int, capacity: int, num_beams: int,
    max_new_tokens: int, length_penalty: float, k: int, kv_bits: int = 16,
):
    """Grouped refill: prefill ``k`` requests in ONE forward (B=k) and
    install each at its slot block.  B=1 prefills waste the MXU at 1.5B —
    batching them is the single biggest pool-overhead fix (docs/PERF.md)."""
    bm = num_beams
    dtype = params["embed_tokens"].dtype
    cachek = qwen2.init_cache(cfg, k, capacity, dtype=dtype, kv_bits=kv_bits)
    s = embeds.shape[1]
    maskk = jnp.zeros((k, capacity), bool).at[:, :s].set(attn_mask)
    hidden, cachek = qwen2.forward(
        params, cfg, embeds.astype(dtype),
        attention_mask=maskk, position_ids=position_ids,
        cache=cachek, cache_index=0,
    )
    logits = qwen2.unembed(params, hidden[:, -1:])[:, 0]     # [k, V]
    logp0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    top_val, top_tok = jax.lax.top_k(logp0, bm)              # [k, bm]
    top_tok = top_tok.astype(jnp.int32)

    (pmask, positions, write_idx, tokens, scores, seqs, t, active,
     fin_seqs, fin_scores, fin_valid) = state

    empty_seqs = jnp.full((bm, max_new_tokens), eos_token_id, jnp.int32)
    for i in range(k):
        slot = slots[i]
        cache = {
            key: jax.lax.dynamic_update_slice(
                cache[key],
                jnp.repeat(cachek[key][:, i: i + 1], bm, axis=1),
                (0, slot * bm) + (0,) * (cache[key].ndim - 2),
            )
            for key in cache
        }
        pmask = jax.lax.dynamic_update_slice(
            pmask, jnp.repeat(maskk[i: i + 1], bm, axis=0), (slot * bm, 0)
        )
        positions = positions.at[slot].set(position_ids[i, -1] + 1)
        write_idx = write_idx.at[slot].set(s)
        tokens = tokens.at[slot].set(top_tok[i])

        seqs0 = empty_seqs.at[:, 0].set(top_tok[i])
        seqs = seqs.at[slot].set(seqs0)
        beam_done = top_tok[i] == eos_token_id
        # bank t=0 EOS beams (generate.py:256-261), scored at length 1
        f_seqs, f_scores, f_valid = _bank(
            empty_seqs,
            jnp.full((bm,), NEG_INF, jnp.float32),
            jnp.zeros((bm,), bool),
            seqs0, top_val[i] / (1.0 ** length_penalty), beam_done,
        )
        fin_seqs = fin_seqs.at[slot].set(f_seqs)
        fin_scores = fin_scores.at[slot].set(f_scores)
        fin_valid = fin_valid.at[slot].set(f_valid)
        scores = scores.at[slot].set(
            jnp.where(beam_done, NEG_INF, top_val[i])
        )
        t = t.at[slot].set(1)
        active = active.at[slot].set(True)
    return cache, (pmask, positions, write_idx, tokens, scores, seqs, t,
                   active, fin_seqs, fin_scores, fin_valid)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "eos_token_id", "steps", "max_new_tokens",
                     "num_beams", "prefill_len", "length_penalty"),
    donate_argnums=(2,),  # cache only — see the pool-layout comment above
)
def _pool_steps(
    params, cfg, cache0, state, *,
    eos_token_id: int, steps: int, max_new_tokens: int, num_beams: int,
    prefill_len: int, length_penalty: float,
):
    """``steps`` beam steps over the whole pool.
    Returns ((cache, state), done[S])."""
    bm = num_beams
    (pmask, positions0, write_idx0, tokens0, scores0, seqs0, t0,
     active0, fs0, fsc0, fv0) = state
    n_slots = positions0.shape[0]
    slots = jnp.arange(n_slots)
    cells = jnp.arange(pmask.shape[1])[None, :]

    def body(carry, _):
        (cache, positions, write_idx, tokens, scores, seqs, t, active,
         fin_seqs, fin_scores, fin_valid) = carry

        kv_mask = pmask | (
            (cells >= prefill_len)
            & (cells < jnp.repeat(write_idx + 1, bm)[:, None])
        )
        emb = qwen2.embed(params, tokens.reshape(-1)[:, None])
        hidden, new_cache = qwen2.forward(
            params, cfg, emb,
            attention_mask=kv_mask,
            position_ids=jnp.repeat(positions, bm)[:, None],
            cache=cache, cache_index=jnp.repeat(write_idx, bm),
        )
        logits = qwen2.unembed(params, hidden)[:, 0]
        vocab = logits.shape[-1]
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1
        ).reshape(n_slots, bm, vocab)

        cand = scores[:, :, None] + logp
        flat = cand.reshape(n_slots, bm * vocab)
        top, idx = jax.lax.top_k(flat, 2 * bm)               # [S, 2bm]
        src_beam = idx // vocab
        tok = (idx % vocab).astype(jnp.int32)

        g = jnp.take_along_axis
        cand_seqs = g(seqs, src_beam[:, :, None], axis=1)    # [S, 2bm, L]
        rows2 = jnp.arange(2 * bm)[None, :]
        cand_seqs = jnp.where(
            (jnp.arange(max_new_tokens)[None, None, :] == t[:, None, None]),
            tok[:, :, None], cand_seqs,
        )
        is_eos = tok == eos_token_id
        newly = is_eos & (rows2 < bm) & active[:, None]
        lp = (t + 1).astype(jnp.float32) ** length_penalty
        nfs, nfsc, nfv = _bank(
            fin_seqs, fin_scores, fin_valid, cand_seqs,
            top / lp[:, None], newly,
        )

        alive_scores = jnp.where(is_eos, NEG_INF, top)
        keep, kidx = jax.lax.top_k(alive_scores, bm)         # [S, bm]
        new_seqs = g(cand_seqs, kidx[:, :, None], axis=1)
        beam_src = g(src_beam, kidx, axis=1)
        new_tok = g(tok, kidx, axis=1)

        # reorder the decode region of the slot's cache block by beam source
        flat_src = (slots[:, None] * bm + beam_src).reshape(-1)
        reordered = {}
        for key in new_cache:  # every cache leaf keeps capacity on axis 2
            dec = jax.lax.dynamic_slice_in_dim(
                new_cache[key], prefill_len, max_new_tokens, axis=2
            )
            dec = dec[:, flat_src]
            reordered[key] = jax.lax.dynamic_update_slice_in_dim(
                new_cache[key], dec, prefill_len, axis=2
            )

        # freeze the decode state of inactive slots — but NOT the cache:
        # a finished slot's cache block is never read again (harvest reads
        # only the banked fin_* token arrays; refill overwrites the block
        # wholesale in _insert_slots), so letting frozen rows accumulate
        # garbage K/V is harmless — exactly like the greedy pool.  A
        # full-cache select here would force XLA to keep the pre-forward
        # cache alive, turning every step's cache update into a full copy
        # (measured 2.5x step time at 32 slots — docs/PERF.md).
        act = active
        cache = reordered
        tokens = jnp.where(act[:, None], new_tok, tokens)
        seqs = jnp.where(act[:, None, None], new_seqs, seqs)
        scores = jnp.where(act[:, None], keep, scores)
        fin_seqs = jnp.where(act[:, None, None], nfs, fin_seqs)
        fin_scores = jnp.where(act[:, None], nfsc, fin_scores)
        fin_valid = jnp.where(act[:, None], nfv, fin_valid)
        write_idx = write_idx + act.astype(jnp.int32)
        positions = positions + act.astype(jnp.int32)
        t = t + act.astype(jnp.int32)

        # provably outcome-identical early exit: bank full AND the most
        # optimistic alive continuation (raw score never increases, is
        # <= 0; L**lp over achievable finish lengths is maximized at
        # L=max_new for lp>=0 but at the SHORTEST length for lp<0 — bound
        # with L=1 there) can't beat the worst banked hypothesis
        opt_div = (
            float(max_new_tokens) ** length_penalty
            if length_penalty >= 0 else 1.0
        )
        opt = jnp.max(scores, axis=1) / opt_div
        cant_improve = jnp.all(fin_valid, axis=1) & (
            opt <= jnp.min(fin_scores, axis=1)
        )
        active = act & ~cant_improve & (t < max_new_tokens)
        carry = (cache, positions, write_idx, tokens, scores, seqs, t,
                 active, fin_seqs, fin_scores, fin_valid)
        return carry, None

    carry = (cache0, positions0, write_idx0, tokens0, scores0, seqs0, t0,
             active0, fs0, fsc0, fv0)
    carry, _ = jax.lax.scan(body, carry, None, length=steps)
    (cache, positions, write_idx, tokens, scores, seqs, t, active,
     fin_seqs, fin_scores, fin_valid) = carry
    new_pool = (cache, (pmask, positions, write_idx, tokens, scores, seqs,
                        t, active, fin_seqs, fin_scores, fin_valid))
    return new_pool, active


@functools.partial(
    jax.jit, static_argnames=("max_new_tokens", "length_penalty"),
)
def _finalize(state, slots, *, max_new_tokens: int, length_penalty: float):
    """Best hypotheses for finished slots (batched — one device round trip
    per harvest, not per slot): alive beams compete at full length against
    the bank, exactly like beam_generate's epilogue (generate.py:356-369).

    ``slots``: int array [m].  Returns [m, max_new_tokens]."""
    (pmask, positions, write_idx, tokens, scores, seqs, t, active,
     fin_seqs, fin_scores, fin_valid) = state
    lp_full = float(max_new_tokens) ** length_penalty
    f_seqs, f_scores, f_valid = _bank(
        fin_seqs[slots], fin_scores[slots], fin_valid[slots],
        seqs[slots], scores[slots] / lp_full,
        jnp.ones_like(scores[slots], bool),
    )
    best = jnp.argmax(jnp.where(f_valid, f_scores, NEG_INF), axis=1)
    return jnp.take_along_axis(
        f_seqs, best[:, None, None], axis=1
    )[:, 0]


class ContinuousBeamDecoder(_SlotPoolBase):
    """Slot pool of independent beam searches (HF/beam_generate semantics).

    ``run(batches)`` consumes ``(key, device_batch)`` and yields
    ``(key, tokens)`` in completion order; per-request output is identical
    to the static ``beam_generate``.  Run-loop protocol (admission,
    grouped refills, pipelined harvest, provably-done skip) lives in
    ``continuous._SlotPoolBase``."""

    _supports_stop_after = False  # banked-hypothesis semantics have no
    #                               app-level truncation equivalent
    _supports_stream = False  # hypotheses reorder until finalization

    def __init__(
        self, model, params, *,
        num_slots: int = 4,
        prefill_len: int,
        max_new_tokens: int = 200,
        eos_token_id: int,
        num_beams: int = 4,
        length_penalty: float = 1.0,
        sync_every: int = 8,
        kv_bits: int = 16,
    ):
        self.model = model
        self.params = params
        self.cfg = model.llm_cfg
        self.num_slots = num_slots
        self.bm = num_beams
        self.prefill_len = prefill_len
        self.max_new = max_new_tokens
        self.eos = eos_token_id
        self.lp = length_penalty
        self.sync_every = sync_every
        self.kv_bits = kv_bits
        self.capacity = prefill_len + max_new_tokens
        dtype = params["llm"]["embed_tokens"].dtype
        self.pool = _init_pool(
            self.cfg, num_slots, num_beams, self.capacity, max_new_tokens,
            eos_token_id, dtype, kv_bits,
        )
        self._keys: list = [None] * num_slots
        self._epoch: list = [0] * num_slots
        # host-side upper bound on each slot's device ``t`` (insert sets
        # t=1; every launched chunk advances active slots by sync_every).
        # When every busy slot provably reached max_new, the next chunk
        # would compute only frozen garbage — the run loop skips it.
        self._t_host: list = [0] * num_slots

    def _reset_slot(self, slot, key):
        self._keys[slot] = key

    def _insert_chunk(self, slots, embeds, mask, pos, *, k, extra, offset):
        return _insert_slots(
            self.params["llm"], self.cfg, *self.pool,
            slots, embeds, mask, pos,
            eos_token_id=self.eos, capacity=self.capacity,
            num_beams=self.bm, max_new_tokens=self.max_new,
            length_penalty=self.lp, k=k, kv_bits=self.kv_bits,
        )

    def _launch_chunk(self):
        self.pool, active = _pool_steps(
            self.params["llm"], self.cfg, *self.pool,
            eos_token_id=self.eos, steps=self.sync_every,
            max_new_tokens=self.max_new, num_beams=self.bm,
            prefill_len=self.prefill_len, length_penalty=self.lp,
        )
        return active

    def _harvest_chunk(self, payload, snapshot, cap):
        active = np.asarray(jax.device_get(payload))
        done = [
            slot for slot, key0, epoch0 in snapshot
            if self._keys[slot] == key0
            and self._epoch[slot] == epoch0
            and not active[slot]
        ]
        if done:
            # one batched finalize per harvest; pad the slot list to a
            # power of two to bound compile variants
            m = len(done)
            mp = 1 << (m - 1).bit_length() if m > 1 else 1
            idx = done + [done[0]] * (mp - m)
            seqs = np.asarray(jax.device_get(_finalize(
                self.pool[1], jnp.asarray(idx, jnp.int32),
                max_new_tokens=self.max_new,
                length_penalty=self.lp,
            )))[:m]
            for slot, seq in zip(done, seqs):
                key = self._keys[slot]
                self._keys[slot] = None
                self._free.append(slot)
                toks = seq[seq != self.eos]
                yield key, toks.astype(np.int32)
