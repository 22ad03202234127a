"""SenseVoiceSmall standalone capabilities: training loss + rich-label ASR.

Covers the vendored model surface beyond the encoder itself
(``Multitask/model/SenseVoice.py:582-932``):

  * rich query dictionaries (language / textnorm / event-emo ids,
    SenseVoice.py:636-641)
  * training loss = CTC on frames 4+ plus rich-label CE on the 4 query
    frames (SenseVoice.py:657-707), with label smoothing
  * ``inference``: fbank -> query prepend -> encoder -> CTC log-softmax ->
    greedy decode (-> optional ban of the emotion-unk label) -> text,
    with optional token timestamps via Viterbi forced alignment at the
    60 ms frame rate (SenseVoice.py:783-924, :936-1009)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ps_slm_tpu.models import sensevoice as sv
from ps_slm_tpu.ops.ctc import ctc_forced_align, ctc_greedy_decode, ctc_loss

LID_DICT = {"auto": 0, "zh": 3, "en": 4, "yue": 7, "ja": 11, "ko": 12,
            "nospeech": 13}
LID_INT_DICT = {24884: 3, 24885: 4, 24888: 7, 24892: 11, 24896: 12, 24992: 13}
TEXTNORM_DICT = {"withitn": 14, "woitn": 15}
TEXTNORM_INT_DICT = {25016: 14, 25017: 15}
EMO_DICT = {"unk": 25009, "happy": 25001, "sad": 25002, "angry": 25003,
            "neutral": 25004}
FRAME_MS = 60  # LFR frame rate (SenseVoice.py:913)


def rich_ce_loss(
    logits: jnp.ndarray,    # [B, 4, V] query-frame logits
    labels: jnp.ndarray,    # [B, 4] rich labels (lid/event/emo/textnorm ids)
    smoothing: float = 0.0,
    ignore_id: int = -1,
) -> jnp.ndarray:
    """Label-smoothed CE over the 4 query frames (SenseVoice.py:692-696)."""
    v = logits.shape[-1]
    valid = labels != ignore_id
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if smoothing > 0.0:
        uniform = -jnp.mean(logp, axis=-1)
        nll = (1 - smoothing) * nll + smoothing * uniform
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def encoder_train_loss(
    params: Dict[str, Any],
    cfg: sv.SenseVoiceConfig,
    speech: jnp.ndarray,        # [B, T, input] WITH 4 query frames prepended
    speech_lens: jnp.ndarray,
    text: jnp.ndarray,          # [B, 4+L]: 4 rich labels then CTC targets
    text_lens: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """SenseVoiceSmall.forward training objective (SenseVoice.py:657-707):
    loss = CTC(frames 4+, text[4:]) + richCE(frames :4, text[:4])."""
    hidden, out_lens = sv.encode(params, cfg, speech, speech_lens)
    logits = sv.ctc_logits(params, hidden)
    loss_ctc = ctc_loss(
        logits[:, 4:], out_lens - 4, text[:, 4:], text_lens - 4,
        blank_id=cfg.blank_id,
    )
    loss_rich = rich_ce_loss(logits[:, :4], text[:, :4])
    return {
        "loss": loss_ctc + loss_rich,
        "loss_ctc": loss_ctc,
        "loss_rich": loss_rich,
    }


def _prepend_queries(
    params, speech: jnp.ndarray, lens: jnp.ndarray,
    language: str, textnorm: str,
) -> tuple:
    """Inference-style query prepend (SenseVoice.py:827-851): order is
    [language, event, emo, textnorm] before the fbank frames."""
    b = speech.shape[0]
    lid = LID_DICT.get(language, 0)
    tn = TEXTNORM_DICT.get(textnorm, 15)
    q = sv.query_embedding(params, [lid, 1, 2, tn])          # [4, input]
    q = jnp.broadcast_to(q[None], (b,) + q.shape).astype(speech.dtype)
    return jnp.concatenate([q, speech], axis=1), lens + 4


import functools


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "language", "textnorm", "ban_emo_unk"),
)
def _infer_device(
    params, cfg, speech, speech_lens, language, textnorm, ban_emo_unk
):
    """Device half of standalone inference, one jitted program."""
    x, lens = _prepend_queries(params, speech, speech_lens, language, textnorm)
    hidden, out_lens = sv.encode(params, cfg, x, lens)
    logits = sv.ctc_logits(params, hidden)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if ban_emo_unk:
        log_probs = log_probs.at[:, :, EMO_DICT["unk"]].set(-jnp.inf)
    token_ids, token_lens = ctc_greedy_decode(
        log_probs, out_lens, blank=cfg.blank_id
    )
    return log_probs, out_lens, token_ids, token_lens


def inference(
    params: Dict[str, Any],
    cfg: sv.SenseVoiceConfig,
    tokenizer,
    speech: jnp.ndarray,          # [B, T, input] LFR features (no queries)
    speech_lens: jnp.ndarray,
    *,
    language: str = "auto",
    use_itn: bool = False,
    ban_emo_unk: bool = False,
    output_timestamp: bool = False,
    keys: Optional[List[str]] = None,
) -> List[Dict[str, Any]]:
    """Standalone rich-label ASR (SenseVoice.py:783-924)."""
    textnorm = "withitn" if use_itn else "woitn"
    log_probs, out_lens, token_ids, token_lens = _infer_device(
        params, cfg, speech, speech_lens, language, textnorm, ban_emo_unk
    )
    token_ids = np.asarray(token_ids)
    token_lens = np.asarray(token_lens)
    out_lens_np = np.asarray(out_lens)

    b = speech.shape[0]
    keys = keys or [f"utt{i}" for i in range(b)]
    results = []

    if output_timestamp:
        # align speech frames (drop the 4 query frames; SenseVoice.py:893)
        speech_logp = log_probs[:, 4:]
        # zero out blank prob where argmax is blank (reference :896)
        pred = jnp.argmax(speech_logp, axis=-1)
        speech_logp = jnp.where(
            (pred == cfg.blank_id)[..., None]
            & (jnp.arange(speech_logp.shape[-1]) == cfg.blank_id),
            0.0, speech_logp,
        )
        # per the reference, alignment targets skip the 4 rich tokens
        max_l = token_ids.shape[1]
        tgt = np.zeros((b, max_l), np.int32)
        tlen = np.zeros((b,), np.int32)
        for i in range(b):
            toks = token_ids[i, 4: token_lens[i]]
            tgt[i, : len(toks)] = toks
            tlen[i] = len(toks)
        align = np.asarray(ctc_forced_align(
            speech_logp, jnp.asarray(tgt),
            jnp.asarray(out_lens_np - 4), jnp.asarray(tlen),
            blank=cfg.blank_id,
        ))

    for i in range(b):
        ids = [int(t) for t in token_ids[i, : token_lens[i]]]
        text = tokenizer.decode(ids)
        result: Dict[str, Any] = {"key": keys[i], "text": text}
        if output_timestamp:
            ts = []
            frames = align[i, : out_lens_np[i] - 4]
            ts_max = (out_lens_np[i] - 4)
            start = 0
            j = 0
            pieces = [tokenizer.decode([t]) for t in ids[4:]]
            prev = None
            run_start = 0
            seq = list(frames) + [None]
            for idx, lab in enumerate(seq):
                if lab != prev:
                    if prev is not None and prev != cfg.blank_id:
                        left = max((run_start * FRAME_MS - 30) / 1000, 0)
                        right = min(
                            (idx * FRAME_MS - 30) / 1000,
                            (ts_max * FRAME_MS - 30) / 1000,
                        )
                        if j < len(pieces):
                            ts.append([pieces[j], left, right])
                            j += 1
                    run_start = idx
                    prev = lab
            result["timestamp"] = ts
        results.append(result)
    return results
