"""CTC primitives: loss, Viterbi forced alignment, greedy decode.

Replaces the reference's funasr/warp-CTC surface:
  * CTC loss for encoder training (``SenseVoice.py:619,749-764``) — thin
    wrapper over ``optax.ctc_loss`` (an XLA-native lattice implementation)
  * ``ctc_forced_align`` (``SenseVoice.py:936-1009``): Viterbi alignment over
    the blank-interleaved label lattice, used for SenseVoice output
    timestamps — re-expressed as ``lax.scan`` forward + backtrace with
    static shapes (the reference used Python loops over time)
  * greedy CTC decode (argmax -> collapse repeats -> drop blank), the
    standalone-ASR path (``SenseVoice.py:869-887``)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ctc_loss(
    logits: jnp.ndarray,       # [B, T, V]
    logit_lens: jnp.ndarray,   # [B]
    labels: jnp.ndarray,       # [B, L]
    label_lens: jnp.ndarray,   # [B]
    blank_id: int = 0,
) -> jnp.ndarray:
    """Mean CTC loss (sum over batch / batch size, Kaldi/funasr 'sum' then
    normalized like funasr CTC with reduction over batch)."""
    import optax

    b, t, _ = logits.shape
    l = labels.shape[1]
    logit_pad = (
        jax.lax.broadcasted_iota(jnp.int32, (b, t), 1) >= logit_lens[:, None]
    ).astype(jnp.float32)
    label_pad = (
        jax.lax.broadcasted_iota(jnp.int32, (b, l), 1) >= label_lens[:, None]
    ).astype(jnp.float32)
    per_ex = optax.ctc_loss(
        logits.astype(jnp.float32), logit_pad, labels, label_pad,
        blank_id=blank_id,
    )
    return jnp.mean(per_ex)


def _extend_targets(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """[L] -> [2L+1] blank-interleaved lattice labels."""
    l = targets.shape[0]
    ext = jnp.full((2 * l + 1,), blank, targets.dtype)
    return ext.at[1::2].set(targets)


def _align_row(
    log_probs: jnp.ndarray,   # [T, V]
    targets: jnp.ndarray,     # [L]
    input_len: jnp.ndarray,   # scalar
    target_len: jnp.ndarray,  # scalar
    blank: int,
) -> jnp.ndarray:
    """Viterbi CTC alignment for one row. Returns [T] lattice labels
    (blank or target token per frame); frames >= input_len are blank."""
    t_max, _ = log_probs.shape
    l = targets.shape[0]
    s = 2 * l + 1
    ext = _extend_targets(targets, blank)                   # [S]
    pos = jnp.arange(s)
    # transitions: from s (stay), s-1, s-2 (skip allowed when labels differ
    # and current is non-blank)
    prev2_ok = (pos >= 2) & (pos % 2 == 1)
    ext_prev2 = jnp.concatenate([jnp.full((2,), -1, ext.dtype), ext[:-2]])
    skip_ok = prev2_ok & (ext != ext_prev2)

    emit = jnp.take(log_probs, ext, axis=1)                  # [T, S]

    alpha0 = jnp.full((s,), NEG_INF)
    alpha0 = alpha0.at[0].set(emit[0, 0])
    alpha0 = alpha0.at[1].set(jnp.where(l > 0, emit[0, 1], NEG_INF))

    def step(alpha, emit_t):
        stay = alpha
        prev1 = jnp.concatenate([jnp.array([NEG_INF]), alpha[:-1]])
        prev2 = jnp.where(
            skip_ok,
            jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]]),
            NEG_INF,
        )
        stacked = jnp.stack([stay, prev1, prev2])            # [3, S]
        best = jnp.argmax(stacked, axis=0)                   # [3 -> back idx]
        new_alpha = jnp.max(stacked, axis=0) + emit_t
        return new_alpha, (best, new_alpha)

    # one pass yields both backpointers and the alpha trajectory
    _, (backs, alpha_traj) = jax.lax.scan(step, alpha0, emit[1:])
    alpha_all = jnp.concatenate([alpha0[None], alpha_traj])  # [T, S]

    final_alpha = alpha_all[jnp.maximum(input_len - 1, 0)]   # [S]
    end1 = 2 * target_len - 1
    end2 = 2 * target_len
    last_state = jnp.where(
        final_alpha[jnp.maximum(end1, 0)] >= final_alpha[end2], end1, end2
    ).astype(jnp.int32)
    last_state = jnp.maximum(last_state, 0)

    # backtrace from input_len-1 down to 0 over the full static T
    t_idx = jnp.arange(t_max - 1, 0, -1)                     # T-1 .. 1

    def back_step(state, t):
        # moving from frame t to t-1 uses backs[t-1]
        active = t <= input_len - 1
        jump = backs[t - 1, state]
        new_state = jnp.where(active, state - jump, state)
        return new_state.astype(jnp.int32), state

    state0, states_rev = jax.lax.scan(back_step, last_state, t_idx)
    # states_rev[i] = state at frame t_idx[i] (T-1 .. 1); carry = frame 0
    states = jnp.concatenate([state0[None], states_rev[::-1]])  # [T]

    frame_labels = jnp.take(ext, states)
    frame_valid = jnp.arange(t_max) < input_len
    return jnp.where(frame_valid, frame_labels, blank)


@functools.partial(jax.jit, static_argnames=("blank",))
def ctc_forced_align(
    log_probs: jnp.ndarray,    # [B, T, V]
    targets: jnp.ndarray,      # [B, L]
    input_lens: jnp.ndarray,   # [B]
    target_lens: jnp.ndarray,  # [B]
    blank: int = 0,
) -> jnp.ndarray:
    """Batched Viterbi alignment: per-frame emitted label (blank-expanded)."""
    return jax.vmap(
        lambda lp, tg, il, tl: _align_row(lp, tg, il, tl, blank)
    )(log_probs, targets, input_lens, target_lens)


def ctc_greedy_decode(
    log_probs: jnp.ndarray,   # [B, T, V]
    lens: jnp.ndarray,        # [B]
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Argmax -> collapse repeats -> drop blanks, left-compacted.

    Returns (ids [B, T] padded with blank, out_lens [B]).
    """
    b, t, _ = log_probs.shape
    ids = jnp.argmax(log_probs, axis=-1)                     # [B, T]
    valid = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1) < lens[:, None]
    prev = jnp.concatenate([ids[:, :1] - 1, ids[:, :-1]], axis=1)
    keep = (ids != prev) & (ids != blank) & valid
    dest = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    dest = jnp.where(keep, dest, t)
    out = jnp.full((b, t), blank, ids.dtype)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (b, t), 0)
    out = out.at[bidx, dest].set(ids, mode="drop")
    return out, jnp.sum(keep, axis=1).astype(jnp.int32)
