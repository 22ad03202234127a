"""CTC pseudo-posterior simulation from ground-truth text (text-only TASU).

Behavioral parity with ``ctc_pseudo_posterior`` (``Multitask/model/ps-slm.py:
337-358``) and ``ctc_pseudo_posterior_noise`` (``ps-slm.py:360-409``), which
tokenize + build one-hots in per-sample host loops every step.  Here the host
only tokenizes (ids are part of the batch); the one-hot construction, CPS
label smoothing and frame dropping are one jittable, explicitly-seeded
transform (reference RNG was implicit torch host RNG — SURVEY.md §7 "hard
part 6").

Noise model (reference defaults ps-slm.py:372-375):
  * label smoothing: per-utterance alpha ~ U(smooth_low=0.0, smooth_high=0.1),
    soft = (1-alpha) * onehot + alpha / V
  * frame dropping: keep each frame with prob 1 - drop_prob (0.05), compact
  * insertion (insert_prob, ps-slm.py:388-399): n_insert = floor(n_kept *
    insert_prob) frames, each a 50/50 duplicate-of-previous-frame or blank
    one-hot at a uniform position.  Jitted with a static insertion budget
    ceil(L * insert_prob): insertions are interleaved by sorting fractional
    position keys instead of the reference's sequential host loop (positions
    are drawn over the post-drop sequence rather than the growing one — same
    noise class, explicit-key RNG).

Static shapes: ids come in padded [B, L]; output frame axis is
L + ceil(L * insert_prob) with ``new_lens`` validity.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def pseudo_posterior(
    ids: jnp.ndarray,     # [B, L] int32 (padded with anything)
    lens: jnp.ndarray,    # [B]
    *,
    vocab_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clean one-hot pseudo-posterior (ps-slm.py:337-358). fp32 output."""
    b, l = ids.shape
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (b, l), 1) < lens[:, None]
    )
    onehot = jax.nn.one_hot(ids, vocab_size, dtype=jnp.float32)
    return onehot * valid[..., None], lens


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_size", "drop_prob", "smooth_low", "smooth_high",
        "insert_prob", "blank_id",
    ),
)
def pseudo_posterior_noise(
    ids: jnp.ndarray,     # [B, L]
    lens: jnp.ndarray,    # [B]
    key: jax.Array,
    *,
    vocab_size: int,
    drop_prob: float = 0.05,
    smooth_low: float = 0.0,
    smooth_high: float = 0.1,
    insert_prob: float = 0.0,
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CPS-noised pseudo-posterior (ps-slm.py:360-409).

    Returns (posterior [B, L + ceil(L*insert_prob), V] fp32 left-compacted,
    new_lens [B]).
    """
    b, l = ids.shape
    k_alpha, k_drop, k_ins = jax.random.split(key, 3)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
    valid = pos < lens[:, None]

    alpha = jax.random.uniform(
        k_alpha, (b, 1, 1), minval=smooth_low, maxval=smooth_high
    )
    onehot = jax.nn.one_hot(ids, vocab_size, dtype=jnp.float32)
    soft = (1.0 - alpha) * onehot + alpha / vocab_size

    keep = jax.random.uniform(k_drop, (b, l)) > drop_prob
    keep = keep & valid

    # left-compaction scatter
    dest = jnp.cumsum(keep.astype(jnp.int32), axis=-1) - 1
    dest = jnp.where(keep, dest, l)  # OOB => dropped
    batch_idx = jax.lax.broadcasted_iota(jnp.int32, (b, l), 0)
    out = jnp.zeros((b, l, vocab_size), jnp.float32)
    out = out.at[batch_idx, dest].set(soft, mode="drop")
    new_lens = jnp.sum(keep.astype(jnp.int32), axis=-1)

    m = int(math.ceil(l * insert_prob))
    if m == 0:
        return out, new_lens

    # duplicate-or-blank insertion (ps-slm.py:388-399): interleave by sorting
    # fractional position keys so the whole op stays statically shaped
    k_pos, k_jit, k_type = jax.random.split(k_ins, 3)
    n_ins = jnp.floor(
        new_lens.astype(jnp.float32) * insert_prob
    ).astype(jnp.int32)                                     # [B]
    j = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    active = j < n_ins[:, None]
    # insertion slot p in [0, n]: the frame lands between p-1 and p
    u = jax.random.uniform(k_pos, (b, m))
    p = jnp.floor(u * (new_lens[:, None] + 1).astype(jnp.float32))
    p = jnp.minimum(p.astype(jnp.int32), new_lens[:, None])
    # jitter in (0.05, 0.45) keeps keys strictly between integers and gives
    # same-slot insertions a random relative order
    jitter = jax.random.uniform(k_jit, (b, m), minval=0.05, maxval=0.45)
    ins_keys = p.astype(jnp.float32) - 0.5 + jitter
    ins_keys = jnp.where(active, ins_keys, jnp.inf)

    dup_idx = jnp.clip(p - 1, 0, l - 1)                     # soft[0] when p=0
    dup = jnp.take_along_axis(out, dup_idx[..., None], axis=1)  # [B, m, V]
    blank_vec = jax.nn.one_hot(blank_id, vocab_size, dtype=jnp.float32)
    use_dup = (jax.random.uniform(k_type, (b, m)) < 0.5) & (
        new_lens[:, None] > 0
    )
    ins_frames = jnp.where(use_dup[..., None], dup, blank_vec[None, None])
    ins_frames = ins_frames * active[..., None]

    orig_keys = jnp.where(
        pos < new_lens[:, None], pos.astype(jnp.float32), jnp.inf
    )
    all_keys = jnp.concatenate([orig_keys, ins_keys], axis=1)   # [B, L+m]
    all_frames = jnp.concatenate([out, ins_frames], axis=1)     # [B, L+m, V]
    order = jnp.argsort(all_keys, axis=1)
    out = jnp.take_along_axis(all_frames, order[..., None], axis=1)
    new_lens = new_lens + jnp.sum(active.astype(jnp.int32), axis=1)
    return out, new_lens
