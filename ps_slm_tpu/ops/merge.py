"""Merge audio-feature spans into the token embedding stream — statically shaped.

Behavioral parity with ``_merge_input_ids_with_audio_features``
(``Multitask/model/ps-slm.py:679-873``, Qwen2-Audio style): each ``<speech>``
placeholder token is replaced by that row's variable-length audio embedding
span; attention mask, labels (audio span → ignore) and position ids are
rebuilt; right padding for training, left padding for batched generation.

TPU-native difference: the reference sizes its output by the *batch max*
merged length (dynamic); here the output length is the static worst case
``OUT = S + A - 1`` (text length S, padded audio bucket A) so the whole step
jits without retracing.  Validity is carried by the returned attention mask.

Exactly one ``<speech>`` token per row is assumed (the reference data pipeline
guarantees this: prompt template ``DataConfig.prompt_style``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Merged(NamedTuple):
    embeds: jnp.ndarray          # [B, OUT, E]
    attention_mask: jnp.ndarray  # [B, OUT] bool
    labels: Optional[jnp.ndarray]  # [B, OUT] int32 or None
    position_ids: jnp.ndarray    # [B, OUT] int32
    input_ids: jnp.ndarray       # [B, OUT] int32 (pad-filled; audio span = pad)


@functools.partial(
    jax.jit,
    static_argnames=("speech_token_id", "ignore_id", "pad_token_id", "left_padding"),
)
def merge_audio_text(
    audio_features: jnp.ndarray,     # [B, A, E]
    audio_lens: jnp.ndarray,         # [B]
    inputs_embeds: jnp.ndarray,      # [B, S, E]
    input_ids: jnp.ndarray,          # [B, S]
    attention_mask: jnp.ndarray,     # [B, S] bool/int
    labels: Optional[jnp.ndarray] = None,   # [B, S]
    *,
    speech_token_id: int,
    ignore_id: int = -100,
    pad_token_id: int = 0,
    left_padding: bool = False,
) -> Merged:
    b, a, e = audio_features.shape
    s = input_ids.shape[1]
    out_len = s + a - 1
    attention_mask = attention_mask.astype(bool)
    audio_lens = audio_lens.astype(jnp.int32)

    is_speech = input_ids == speech_token_id

    # span width of each source token in the merged row (ps-slm.py:805-808)
    ph = jnp.where(is_speech, audio_lens[:, None], 1).astype(jnp.int32)
    start = jnp.cumsum(ph, axis=-1) - ph                    # [B,S] span starts

    if left_padding:
        # shift so each row ends at out_len-1 (ps-slm.py:810-812)
        total = jnp.sum(ph, axis=-1)                         # [B]
        offset = (out_len - total)[:, None]
        start = start + offset

    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (b, s), 0)

    # ---- text scatter ----
    text_valid = attention_mask & ~is_speech
    text_dest = jnp.where(text_valid, start, out_len)        # OOB => dropped

    final_emb = jnp.zeros((b, out_len, e), inputs_embeds.dtype)
    final_emb = final_emb.at[batch_idx, text_dest].set(
        inputs_embeds, mode="drop"
    )
    final_mask = jnp.zeros((b, out_len), bool)
    final_mask = final_mask.at[batch_idx, text_dest].set(
        True, mode="drop"
    )
    final_ids = jnp.full((b, out_len), pad_token_id, input_ids.dtype)
    final_ids = final_ids.at[batch_idx, text_dest].set(input_ids, mode="drop")

    final_labels = None
    if labels is not None:
        final_labels = jnp.full((b, out_len), ignore_id, jnp.int32)
        final_labels = final_labels.at[batch_idx, text_dest].set(
            labels.astype(jnp.int32), mode="drop"
        )

    # ---- audio scatter ----
    # speech token's span start per row (exactly one speech token)
    speech_start = jnp.sum(jnp.where(is_speech, start, 0), axis=-1)  # [B]
    frame_idx = jax.lax.broadcasted_iota(jnp.int32, (b, a), 1)
    frame_valid = frame_idx < audio_lens[:, None]
    audio_dest = jnp.where(
        frame_valid, speech_start[:, None] + frame_idx, out_len
    )
    abatch_idx = jax.lax.broadcasted_iota(jnp.int32, (b, a), 0)
    final_emb = final_emb.at[abatch_idx, audio_dest].set(
        audio_features.astype(final_emb.dtype), mode="drop"
    )
    final_mask = final_mask.at[abatch_idx, audio_dest].set(True, mode="drop")

    # position ids (ps-slm.py:871): cumsum-1 over mask, pads forced to 1
    csum = jnp.cumsum(final_mask.astype(jnp.int32), axis=-1) - 1
    position_ids = jnp.where(final_mask, csum, 1).astype(jnp.int32)

    return Merged(final_emb, final_mask, final_labels, position_ids, final_ids)
