"""Causal cross-entropy over a large vocabulary: chunked and gathered forms.

The naive path materializes fp32 logits [B, T, V] (1.3 GB at B=4, T=543,
V=152k) plus a same-size log-softmax — ~5 GB of HBM traffic per step before
backward.  Two alternatives:

* :func:`chunked_ce_loss` scans over sequence chunks, computing each chunk's
  logits -> logsumexp -> gathered label logit and discarding the logits
  immediately; ``jax.checkpoint`` on the chunk body makes backward recompute
  them chunk by chunk, so peak memory is O(B * chunk * V).
* :func:`gathered_ce_loss` exploits the TASU label structure: in a merged
  audio+text sequence only the *text target* positions carry labels — the
  whole audio span and the prompt are ``-100`` (ps-slm.py:679-873 label
  surgery).  It compacts the <= ``max_valid`` valid positions to the front
  (stable argsort on the validity mask, a static shape) and runs the
  [H, 152k] unembedding on those rows only — ~17x fewer CE FLOPs at the
  published recipe's shapes (544 merged positions, ~30 labeled).

Both return the argmax-match count so the training accuracy metric
(utils/metric.py semantics) needs no second pass over the logits.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk",))
def chunked_ce_loss(
    hidden: jnp.ndarray,      # [B, T, H] (pre-shift hidden states)
    unembed: jnp.ndarray,     # [H, V]
    labels: jnp.ndarray,      # [B, T] int32 (-100 = ignore), pre-shift
    *,
    ignore_id: int = -100,
    chunk: int = 128,
    logit_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Causal-shift CE: hidden[:, t] predicts labels[:, t+1].

    Returns (loss, acc, ntokens) — means over valid positions.
    """
    b, t, h = hidden.shape
    # shift: positions 0..T-2 predict labels 1..T-1
    x = hidden[:, :-1]
    y = labels[:, 1:].astype(jnp.int32)
    n = t - 1
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=ignore_id)
    n_chunks = (n + pad) // chunk
    x = x.reshape(b, n_chunks, chunk, h).swapaxes(0, 1)   # [C, B, c, H]
    y = y.reshape(b, n_chunks, chunk).swapaxes(0, 1)      # [C, B, c]

    def body(carry, inp):
        nll_sum, correct, count = carry
        xc, yc = inp

        def chunk_stats(xc, yc):
            logits = (
                xc.astype(unembed.dtype) @ unembed
            ).astype(jnp.float32)                         # [B, c, V]
            if logit_bias is not None:
                logits = logits + logit_bias
            valid = yc != ignore_id
            safe = jnp.where(valid, yc, 0)
            lse = jax.nn.logsumexp(logits, axis=-1)
            gathered = jnp.take_along_axis(
                logits, safe[..., None], axis=-1
            )[..., 0]
            nll = jnp.where(valid, lse - gathered, 0.0)
            pred = jnp.argmax(logits, axis=-1)
            corr = jnp.sum((pred == safe) & valid)
            return jnp.sum(nll), corr, jnp.sum(valid)

        s, c, k = jax.checkpoint(chunk_stats)(xc, yc)
        return (nll_sum + s, correct + c, count + k), None

    init = (
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    (nll_sum, correct, count), _ = jax.lax.scan(body, init, (x, y))
    denom = jnp.maximum(count, 1)
    return nll_sum / denom, correct / denom, count


@functools.partial(jax.jit, static_argnames=("max_valid",))
def gathered_ce_loss(
    hidden: jnp.ndarray,      # [B, T, H] (pre-shift hidden states)
    unembed: jnp.ndarray,     # [H, V]
    labels: jnp.ndarray,      # [B, T] int32 (-100 = ignore), pre-shift
    *,
    max_valid: int,
    ignore_id: int = -100,
    logit_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Causal-shift CE over the valid-label positions only.

    ``max_valid`` must be a static upper bound on the number of positions
    *per row* with labels != ignore_id after the shift (for merged TASU
    batches: the pre-merge text length, since audio spans never carry
    labels).  Positions beyond the bound would be silently dropped, so
    callers must size it from the pre-merge text length.

    The compaction is per-row (argsort along the time axis only) so the
    batch dimension — and its data/fsdp sharding — stays intact: no
    cross-device all-gather is needed on a mesh.

    Returns (loss, acc, ntokens) — means over valid positions, identical to
    the naive full-logits path.
    """
    b, t, h = hidden.shape
    x = hidden[:, :-1]                                    # [B, T-1, H]
    y = labels[:, 1:].astype(jnp.int32)                   # [B, T-1]
    valid = y != ignore_id
    m = min(max_valid, t - 1)
    # stable sort on ~valid floats each row's valid positions to the front
    order = jnp.argsort(
        jnp.logical_not(valid), axis=1, stable=True
    )[:, :m]                                              # [B, m]
    xs = jnp.take_along_axis(x, order[..., None], axis=1)  # [B, m, H]
    ys = jnp.take_along_axis(y, order, axis=1)
    vs = jnp.take_along_axis(valid, order, axis=1)

    logits = (
        xs.astype(unembed.dtype) @ unembed
    ).astype(jnp.float32)                                  # [B, m, V]
    if logit_bias is not None:
        logits = logits + logit_bias
    safe = jnp.where(vs, ys, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)
    gathered = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(vs, lse - gathered, 0.0)
    pred = jnp.argmax(logits, axis=-1)
    ntok = jnp.sum(vs)
    denom = jnp.maximum(ntok, 1)
    loss = jnp.sum(nll) / denom
    acc = jnp.sum((pred == safe) & vs) / denom
    return loss, acc, ntok
