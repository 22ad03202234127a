"""PSD (posterior-synchronous downsampling) — fully vectorized on device.

Behavioral parity with ``slam_model_asr.psd`` (``Multitask/model/ps-slm.py:
237-317``), which runs per-sample per-frame Python loops on host (a noted
reference bottleneck, SURVEY.md §3.1).  Semantics:

  1. merge runs of adjacent identical *non-blank* argmax frames (mean-pool the
     features over the run); blank frames stay individual;
  2. drop merged frames whose (averaged) blank probability >= threshold (0.9);
  3. left-compact and zero-pad.

TPU-native formulation: segment boundaries from argmax change-points +
blank walls, segment ids by cumsum, per-segment mean via ``segment_sum``,
keep-mask compaction by scatter — one jittable op, vmapped over batch.
Output keeps the padded input length T (static shape); ``new_lens`` carries
validity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _psd_row(
    feats: jnp.ndarray,       # [T, D]
    length: jnp.ndarray,      # scalar
    blank_prob: jnp.ndarray,  # [T]
    ids: jnp.ndarray,         # [T] argmax token ids
    blank_id: int,
    blank_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment reductions expressed as one-hot matmuls: TPU scatters
    serialize badly at [T, 25k]-row granularity while a [T,T]x[T,D] matmul
    rides the MXU (orders of magnitude faster at CTC-vocab widths)."""
    t, d = feats.shape
    pos = jnp.arange(t)
    valid = pos < length

    is_blank = ids == blank_id
    prev_ids = jnp.concatenate([ids[:1] - 1, ids[:-1]])   # force boundary at 0
    prev_blank = jnp.concatenate([jnp.array([False]), is_blank[:-1]])
    boundary = (ids != prev_ids) | is_blank | prev_blank
    boundary = boundary | (pos == 0)

    seg_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1    # [T], 0-based
    seg_id = jnp.where(valid, seg_id, t)                    # dump invalid

    # frame -> segment assignment matrix [T(frames), T(segments)]
    assign = (
        (seg_id[:, None] == pos[None, :]) & valid[:, None]
    ).astype(jnp.float32)

    seg_count = jnp.sum(assign, axis=0)                     # [T]
    seg_feat = jax.lax.dot_general(
        assign, feats.astype(jnp.float32),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [T, D]
    seg_blank = assign.T @ blank_prob.astype(jnp.float32)

    denom = jnp.maximum(seg_count, 1.0)
    seg_mean = seg_feat / denom[:, None]
    seg_blank_mean = seg_blank / denom
    seg_valid = seg_count > 0

    keep = seg_valid & (seg_blank_mean < blank_threshold)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, dest, t)                         # OOB => dropped

    # compaction as a gather matrix [T(out), T(segments)]
    gather = (dest[None, :] == pos[:, None]).astype(jnp.float32)
    out = (gather @ seg_mean).astype(feats.dtype)
    new_len = jnp.sum(keep.astype(jnp.int32))
    return out, new_len


@functools.partial(jax.jit, static_argnames=("blank_id", "blank_threshold"))
def psd(
    feats: jnp.ndarray,        # [B, T, D]  features to pool (posterior or hidden)
    lens: jnp.ndarray,         # [B]
    posterior: jnp.ndarray,    # [B, T, V]  probabilities (not log)
    *,
    blank_id: int = 0,
    blank_threshold: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized PSD. Returns (pooled [B,T,D] zero-padded, new_lens [B]).

    The reference re-pads to the batch max (ps-slm.py:302-314); we keep the
    static T and let callers slice/bucket.
    """
    ids = jnp.argmax(posterior, axis=-1)
    blank_prob = posterior[..., blank_id]
    return jax.vmap(
        lambda f, l, bp, i: _psd_row(
            f, l, bp, i, blank_id, blank_threshold
        )
    )(feats, lens, blank_prob, ids)
