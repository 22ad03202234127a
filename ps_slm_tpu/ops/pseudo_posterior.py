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
  * insertion (insert_prob, default 0.0): duplicate-or-blank frame insertion;
    the in-jit path supports insert_prob=0 only (the published configs never
    enable it); a host-side reference implementation lives in the tests.

Static shapes: ids come in padded [B, L]; outputs stay [B, L] frames of
[B, L, V] posterior with ``new_lens`` validity (dropping only shrinks).
"""

from __future__ import annotations

import functools
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
    static_argnames=("vocab_size", "drop_prob", "smooth_low", "smooth_high"),
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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CPS-noised pseudo-posterior (ps-slm.py:360-409, insert_prob=0 path).

    Returns (posterior [B,L,V] fp32 left-compacted, new_lens [B]).
    """
    b, l = ids.shape
    k_alpha, k_drop = jax.random.split(key)
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
    return out, new_lens
