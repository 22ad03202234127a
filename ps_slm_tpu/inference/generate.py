"""Autoregressive decoding with a bucketed KV cache, fully under jit.

Replaces the reference's HF ``llm.generate`` call (``ps-slm.py:660-675``,
defaults: beams=4, max_new_tokens=200, greedy scores) with TPU-native
decode loops:

  * prefill: one forward over the merged (left-padded) sequence writes the
    KV cache; capacity is bucketed to ``prefill_len + max_new_tokens``
  * greedy / sampling: ``lax.while_loop`` with early exit when every row
    has emitted EOS
  * beam search: static ``lax.fori_loop`` over steps, 2*beams candidate
    expansion per step, finished-hypothesis tracking, HF-style length
    penalty at finalization

Static shapes throughout: one compilation per (batch, prefill bucket,
max_new_tokens) triple.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ps_slm_tpu.models import qwen2

NEG_INF = -1e30


def _prefill(
    params, cfg, embeds, attn_mask, position_ids, capacity, dtype,
    kv_bits: int = 16,
):
    b = embeds.shape[0]
    s = embeds.shape[1]
    cache = qwen2.init_cache(cfg, b, capacity, dtype=dtype, kv_bits=kv_bits)
    full_mask = jnp.zeros((b, capacity), bool).at[:, :s].set(attn_mask)
    hidden, cache = qwen2.forward(
        params, cfg, embeds,
        attention_mask=full_mask,
        position_ids=position_ids,
        cache=cache, cache_index=0,
    )
    logits = qwen2.unembed(params, hidden[:, -1:])[:, 0]  # [B, V]
    return logits, cache, full_mask


def _step(params, cfg, cache, full_mask, token_ids, positions, index):
    emb = qwen2.embed(params, token_ids[:, None])
    hidden, cache = qwen2.forward(
        params, cfg, emb,
        attention_mask=full_mask,
        position_ids=positions[:, None],
        cache=cache, cache_index=index,
    )
    logits = qwen2.unembed(params, hidden)[:, 0]
    return logits, cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "eos_token_id", "pad_token_id",
        "temperature", "top_p", "do_sample", "min_length",
        "repetition_penalty", "kv_bits",
    ),
)
def greedy_generate(
    params,
    cfg: qwen2.Qwen2Config,
    inputs_embeds: jnp.ndarray,       # [B, S, H] merged, LEFT-padded
    attention_mask: jnp.ndarray,      # [B, S]
    position_ids: jnp.ndarray,        # [B, S]
    rng: Optional[jax.Array] = None,
    *,
    max_new_tokens: int = 200,
    eos_token_id: int = 0,
    pad_token_id: int = 0,
    temperature: float = 1.0,
    top_p: float = 1.0,
    do_sample: bool = False,
    min_length: int = 1,
    repetition_penalty: float = 1.0,
    kv_bits: int = 16,
) -> jnp.ndarray:
    """Greedy / nucleus-sampling decode. Returns [B, max_new_tokens]
    (EOS-filled after termination, HF batch_decode-compatible).

    ``repetition_penalty`` follows the HF rule over *generated* tokens
    (with inputs_embeds-only prompts HF also only sees generated ids).
    ``kv_bits=8`` stores the KV cache int8 (half the decode HBM traffic;
    output may differ from bf16-cache decode within quantization noise).
    """
    b, s, _ = inputs_embeds.shape
    capacity = s + max_new_tokens
    dtype = params["embed_tokens"].dtype

    logits, cache, full_mask = _prefill(
        params, cfg, inputs_embeds, attention_mask, position_ids, capacity,
        dtype, kv_bits,
    )
    next_pos = position_ids[:, -1] + 1  # left padding: last position is valid

    vocab = params["embed_tokens"].shape[0]
    use_rep = repetition_penalty != 1.0
    seen0 = jnp.zeros((b, vocab), bool)

    def sample_from(logits, key, t, seen=None):
        logits = logits.astype(jnp.float32)
        if use_rep and seen is not None:
            penalized = jnp.where(
                logits > 0, logits / repetition_penalty,
                logits * repetition_penalty,
            )
            logits = jnp.where(seen, penalized, logits)
        if min_length > 1:
            logits = jnp.where(
                (t < min_length - 1)
                & (jnp.arange(logits.shape[-1]) == eos_token_id)[None],
                NEG_INF, logits,
            )
        if not do_sample:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if temperature != 1.0:
            logits = logits / temperature
        if top_p < 1.0:
            sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            cutoff_idx = jnp.sum(cum < top_p, axis=-1)
            cutoff = jnp.take_along_axis(
                sorted_logits, cutoff_idx[:, None], axis=-1
            )
            logits = jnp.where(logits < cutoff, NEG_INF, logits)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    key0 = rng if rng is not None else jax.random.PRNGKey(0)
    tokens0 = sample_from(logits, key0, 0, seen0)

    out = jnp.full((b, max_new_tokens), eos_token_id, jnp.int32)
    out = out.at[:, 0].set(tokens0)
    done0 = tokens0 == eos_token_id
    seen = seen0.at[jnp.arange(b), tokens0].set(True) if use_rep else seen0

    def cond(state):
        t, _, _, _, done, _, _, _ = state
        return (t < max_new_tokens) & ~jnp.all(done)

    def body(state):
        t, cache, full_mask, out, done, tokens, key, seen = state
        index = s + t - 1
        full_mask = jax.lax.dynamic_update_slice(
            full_mask, jnp.ones((b, 1), bool), (0, index)
        )
        positions = next_pos + t - 1
        logits, cache = _step(
            params, cfg, cache, full_mask, tokens, positions, index
        )
        key, sub = jax.random.split(key)
        nxt = sample_from(logits, sub, t, seen)
        nxt = jnp.where(done, eos_token_id, nxt)
        out = out.at[:, t].set(nxt)
        done = done | (nxt == eos_token_id)
        if use_rep:
            seen = seen.at[jnp.arange(b), nxt].set(True)
        return t + 1, cache, full_mask, out, done, nxt, key, seen

    _, _, _, out, _, _, _, _ = jax.lax.while_loop(
        cond, body, (1, cache, full_mask, out, done0, tokens0, key0, seen)
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "eos_token_id", "num_beams",
        "length_penalty", "min_length", "repetition_penalty", "kv_bits",
    ),
)
def beam_generate(
    params,
    cfg: qwen2.Qwen2Config,
    inputs_embeds: jnp.ndarray,       # [B, S, H] LEFT-padded
    attention_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    *,
    max_new_tokens: int = 200,
    eos_token_id: int = 0,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    min_length: int = 1,
    repetition_penalty: float = 1.0,
    kv_bits: int = 16,
) -> jnp.ndarray:
    """Beam search (HF semantics: expand 2*beams, bank EOS hypotheses only
    when ranked within the top num_beams, length-penalized selection over
    generated length incl. EOS). Returns [B, max_new_tokens].

    ``repetition_penalty`` follows HF beam search, which applies the penalty
    to the log-softmax scores over each beam's generated-so-far tokens."""
    b, s, h = inputs_embeds.shape
    bm = num_beams
    capacity = s + max_new_tokens
    dtype = params["embed_tokens"].dtype

    # prefill ONCE at batch B, then tile cache/mask to B*bm beams (the
    # reference's HF generate re-runs the prefill per beam)
    def tile(x):
        return jnp.repeat(x, bm, axis=0)

    logits, cache, full_mask = _prefill(
        params, cfg, inputs_embeds, attention_mask, position_ids,
        capacity, dtype, kv_bits,
    )
    cache = {key: jnp.repeat(v, bm, axis=1) for key, v in cache.items()}
    full_mask = tile(full_mask)
    logits = tile(logits)
    next_pos0 = tile(position_ids[:, -1] + 1)  # [B*bm]
    vocab = logits.shape[-1]

    logp0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp0 = logp0.reshape(b, bm, vocab)[:, 0]  # all beams identical at t=0
    if min_length > 1:
        logp0 = logp0.at[:, eos_token_id].set(NEG_INF)
    top_val, top_tok = jax.lax.top_k(logp0, bm)             # [B, bm]

    seqs = jnp.full((b, bm, max_new_tokens), eos_token_id, jnp.int32)
    seqs = seqs.at[:, :, 0].set(top_tok)
    scores = top_val                                         # [B, bm]
    beam_done = top_tok == eos_token_id                      # [B, bm]

    use_rep = repetition_penalty != 1.0
    seen = jnp.zeros((b, bm, vocab), bool)
    if use_rep:
        seen = seen.at[
            jnp.arange(b)[:, None], jnp.arange(bm)[None], top_tok
        ].set(True)

    # finished-hypothesis bank
    fin_seqs = jnp.full((b, bm, max_new_tokens), eos_token_id, jnp.int32)
    fin_scores = jnp.full((b, bm), NEG_INF, jnp.float32)
    fin_valid = jnp.zeros((b, bm), bool)

    def bank(fin_seqs, fin_scores, fin_valid, cand_seqs, cand_scores, newly):
        """Insert newly-finished candidates, keeping the best bm."""
        all_scores = jnp.concatenate(
            [fin_scores, jnp.where(newly, cand_scores, NEG_INF)], axis=1
        )
        all_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        all_valid = jnp.concatenate([fin_valid, newly], axis=1)
        top, idx = jax.lax.top_k(all_scores, bm)
        g = jnp.take_along_axis
        return (
            g(all_seqs, idx[:, :, None], axis=1),
            top,
            g(all_valid, idx, axis=1),
        )

    # bank t=0 EOS beams (scored with length 1)
    lp1 = 1.0 ** length_penalty
    fin_seqs, fin_scores, fin_valid = bank(
        fin_seqs, fin_scores, fin_valid, seqs, scores / lp1, beam_done
    )
    scores = jnp.where(beam_done, NEG_INF, scores)

    tokens = top_tok.reshape(b * bm)

    def body(t, state):
        cache, full_mask, seqs, scores, tokens, seen, fin = state
        fin_seqs, fin_scores, fin_valid = fin
        index = s + t - 1
        full_mask = jax.lax.dynamic_update_slice(
            full_mask, jnp.ones((b * bm, 1), bool), (0, index)
        )
        positions = next_pos0 + t - 1
        logits, cache = _step(
            params, cfg, cache, full_mask, tokens, positions, index
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(b, bm, vocab)
        if use_rep:
            # HF applies the penalty to log-softmax scores in beam search
            penalized = jnp.where(
                logp > 0, logp / repetition_penalty,
                logp * repetition_penalty,
            )
            logp = jnp.where(seen, penalized, logp)
        if min_length > 1:
            logp = jnp.where(
                (t < min_length - 1)
                & (jnp.arange(vocab) == eos_token_id)[None, None],
                NEG_INF, logp,
            )
        cand = scores[:, :, None] + logp                      # [B, bm, V]
        flat = cand.reshape(b, bm * vocab)
        top, idx = jax.lax.top_k(flat, 2 * bm)                # [B, 2bm]
        src_beam = idx // vocab
        tok = (idx % vocab).astype(jnp.int32)

        g = jnp.take_along_axis
        cand_seqs = g(seqs, src_beam[:, :, None], axis=1)     # [B, 2bm, L]
        cand_seqs = cand_seqs.at[:, :, t].set(tok)
        is_eos = tok == eos_token_id
        # HF banks an EOS candidate only when it ranks within the top
        # num_beams of the 2*num_beams expansion (BeamSearchScorer.process:
        # is_beam_token_worse_than_top_num_beams)
        newly = is_eos & (jnp.arange(2 * bm)[None] < bm)
        lp = ((t + 1) ** length_penalty)
        fin_seqs, fin_scores, fin_valid = bank(
            fin_seqs, fin_scores, fin_valid, cand_seqs, top / lp, newly
        )

        # keep the best bm non-finished candidates alive
        alive_scores = jnp.where(is_eos, NEG_INF, top)
        keep, kidx = jax.lax.top_k(alive_scores, bm)          # [B, bm]
        seqs = g(cand_seqs, kidx[:, :, None], axis=1)
        scores = keep
        beam_src = g(src_beam, kidx, axis=1)                  # [B, bm]
        new_tok = g(tok, kidx, axis=1)                        # [B, bm]
        tokens = new_tok.reshape(b * bm)
        if use_rep:
            seen = g(seen, beam_src[:, :, None], axis=1)
            seen = seen.at[
                jnp.arange(b)[:, None], jnp.arange(bm)[None], new_tok
            ].set(True)

        # reorder cache rows by beam source — only the decode region
        # [s, s+max_new): the prefill cells are identical across a row's
        # beams (tiled once, permuted within the row ever since), so
        # gathering them would be a no-op costing a full-cache copy
        # (measured 4.3 ms/step at 1.5B vs ~0.1 ms for the slice, which
        # updates in place inside the fori_loop)
        flat_src = (
            jnp.arange(b)[:, None] * bm + beam_src
        ).reshape(-1)                                         # [B*bm]
        new_cache = {}
        for key in cache:  # every cache leaf keeps capacity on axis 2
            dec = jax.lax.dynamic_slice_in_dim(
                cache[key], s, max_new_tokens, axis=2
            )
            dec = dec[:, flat_src]
            new_cache[key] = jax.lax.dynamic_update_slice_in_dim(
                cache[key], dec, s, axis=2
            )
        cache = new_cache
        return cache, full_mask, seqs, scores, tokens, seen, (
            fin_seqs, fin_scores, fin_valid
        )

    state = (
        cache, full_mask, seqs, scores, tokens, seen,
        (fin_seqs, fin_scores, fin_valid),
    )
    state = jax.lax.fori_loop(1, max_new_tokens, body, state)
    _, _, seqs, scores, _, _, (fin_seqs, fin_scores, fin_valid) = state

    # unfinished beams compete with banked ones at full length
    lp_full = (max_new_tokens ** length_penalty)
    fin_seqs, fin_scores, fin_valid = bank(
        fin_seqs, fin_scores, fin_valid, seqs, scores / lp_full,
        jnp.ones_like(scores, bool),
    )
    best = jnp.argmax(
        jnp.where(fin_valid, fin_scores, NEG_INF), axis=1
    )
    return jnp.take_along_axis(
        fin_seqs, best[:, None, None], axis=1
    )[:, 0]


def _merged_fn(model):
    """Per-model jitted front half (encoder -> posterior -> PSD -> projector
    -> merge).  Without this every op dispatches eagerly — ~1000 host
    round-trips per batch on the relay backend."""
    fn = getattr(model, "_merged_jit", None)
    if fn is None:
        from ps_slm_tpu.models.tasu import prepare_merged

        @jax.jit
        def fn(params, batch):
            return prepare_merged(
                model, params, batch, None,
                left_padding=True, generate_mode=True,
            )

        model._merged_jit = fn
    return fn


def ctc_transcript_ids(model, params, batch) -> "list":
    """CTC argmax -> collapse -> blank-drop per row (the SenseVoice decode
    rule, SenseVoice.py:869-887), computed from the same front end the
    merge uses.  Returns a list of B variable-length encoder-vocab token
    lists — the free draft for speculative decoding."""
    import numpy as np

    fn = getattr(model, "_ctc_ids_jit", None)
    if fn is None:
        from ps_slm_tpu.models.tasu import encode_speech
        from ps_slm_tpu.ops import fbank as fb

        @jax.jit
        def fn(params, batch):
            if "input_features" in batch:
                feats = batch["input_features"]
                flens = batch["input_feature_length"]
            else:
                feats, flens = fb.frontend(
                    batch["waveform"], batch["waveform_length"], None,
                    cfg=model.fbank_cfg, cmvn=model.cmvn, train=False,
                )
                feats = feats.astype(params["llm"]["embed_tokens"].dtype)
            _, posterior, lens = encode_speech(
                params, model.enc_cfg, feats, flens,
                use_flash=model.use_flash,
            )
            return jnp.argmax(posterior, axis=-1), lens

        model._ctc_ids_jit = fn
    ids, lens = fn(params, batch)
    ids, lens = np.asarray(ids), np.asarray(lens)
    out = []
    for row, n in zip(ids, lens):
        toks, prev = [], -1
        for t in row[:n]:
            if t != prev and t != 0:  # collapse runs, drop blank 0
                toks.append(int(t))
            prev = t
        out.append(toks)
    return out


def generate(
    model, params, batch: Dict[str, jnp.ndarray], **kwargs
) -> jnp.ndarray:
    """TASU generate (reference ps-slm.py:539-677): merge with LEFT padding,
    then beam (default 4) or greedy/sampled decode.

    ``draft_ids``/``draft_lens`` (LLM-vocab) switch greedy decoding to the
    draft-verified speculative loop (inference/speculative.py) — output is
    bit-identical, just fewer LLM forwards when drafts match.  Sampling
    passes an explicit PRNG via ``key`` (alias ``rng``); without one,
    ``do_sample=True`` falls back to a fixed PRNGKey(0) stream.
    """
    key = kwargs.pop("key", kwargs.pop("rng", None))
    merged = _merged_fn(model)(params, batch)
    num_beams = kwargs.pop("num_beams", 4)
    max_new_tokens = kwargs.pop("max_new_tokens", 200)
    eos = kwargs.pop("eos_token_id")
    repetition_penalty = kwargs.pop("repetition_penalty", 1.0)
    kv_bits = kwargs.pop("kv_bits", 16)
    draft_ids = kwargs.pop("draft_ids", None)
    draft_lens = kwargs.pop("draft_lens", None)
    if draft_ids is not None and num_beams == 1:
        # the speculative loop is exactly greedy; knobs that would change
        # the output must not be silently dropped (the CLIs validate this
        # too, but the API must hold its own contract)
        if (
            kwargs.get("do_sample")
            or repetition_penalty != 1.0
            or kwargs.get("temperature", 1.0) != 1.0
            or kwargs.get("min_length", 1) > 1
        ):
            raise ValueError(
                "draft-speculative decoding is bit-identical to plain "
                "greedy; do_sample/temperature/repetition_penalty/"
                "min_length are not supported with draft_ids"
            )
        from ps_slm_tpu.inference.speculative import (
            speculative_greedy_generate,
        )

        out, _ = speculative_greedy_generate(
            params["llm"], model.llm_cfg,
            merged.embeds, merged.attention_mask, merged.position_ids,
            jnp.asarray(draft_ids), jnp.asarray(draft_lens),
            max_new_tokens=max_new_tokens, eos_token_id=eos,
            window=kwargs.pop("spec_window", 8), kv_bits=kv_bits,
        )
        return out
    if num_beams > 1:
        return beam_generate(
            params["llm"], model.llm_cfg,
            merged.embeds, merged.attention_mask, merged.position_ids,
            max_new_tokens=max_new_tokens, eos_token_id=eos,
            num_beams=num_beams,
            length_penalty=kwargs.pop("length_penalty", 1.0),
            min_length=kwargs.pop("min_length", 1),
            repetition_penalty=repetition_penalty,
            kv_bits=kv_bits,
        )
    return greedy_generate(
        params["llm"], model.llm_cfg,
        merged.embeds, merged.attention_mask, merged.position_ids,
        key,
        max_new_tokens=max_new_tokens, eos_token_id=eos,
        do_sample=kwargs.pop("do_sample", False),
        temperature=kwargs.pop("temperature", 1.0),
        top_p=kwargs.pop("top_p", 1.0),
        min_length=kwargs.pop("min_length", 1),
        repetition_penalty=repetition_penalty,
        kv_bits=kv_bits,
    )
