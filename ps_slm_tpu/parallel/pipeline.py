"""GPipe pipeline parallelism over the stacked decoder layers.

The reference has **no** pipeline parallelism (SURVEY.md §2.C: TP/PP/EP/SP
all absent — its scale-out is DeepSpeed ZeRO-2 data parallelism only,
``conf/ds_config.json:15-21``).  This module is a beyond-parity mesh axis
for stacks that outgrow FSDP+TP: it shards the *layer* axis of the
scan-stacked decoder (``models/qwen2.py`` keeps every layer leaf as
``[L, ...]``) over a ``pipe`` mesh axis and runs the classic GPipe
schedule.

Design (TPU-first, not a port of any torch pipeline engine):

* ``jax.shard_map`` manual over the ``pipe`` axis ONLY — ``data``/``fsdp``/
  ``tensor`` stay auto, so GSPMD keeps handling batch sharding, ZeRO-style
  param gathering, and megatron TP *inside* each pipeline stage.
* Each of the P stages holds a contiguous ``L/P`` chunk of the layer stack.
  M microbatches flow through in ``M + P - 1`` steps; activations — and the
  positions/attention-mask that belong to the in-flight microbatch — rotate
  stage-to-stage with ``lax.ppermute`` (a neighbour exchange, the cheapest
  collective on an ICI/DCN ring).
* Stage ``P-1`` collects its outputs; everyone else contributes zeros and a
  final ``psum`` over ``pipe`` makes the result pipe-invariant.  Backward is
  just autodiff: the transpose of ``ppermute`` is the reverse rotation, so
  the reverse schedule needs no hand-written code; ``remat=True``
  checkpoints each layer application (matching the non-pipelined path).

Bubble fraction = (P-1)/(M+P-1); pick ``n_micro >= 2P`` to keep it under
a third.  Decode (KV-cache) paths do not use this module — at 1.5B the
flagship serves on a single chip; PP is a training-scale feature.

LoRA-dropout note: dropout masks are drawn per microbatch (Bernoulli shapes
follow the activation), so at M>1 the pipelined step samples a *different
stream* than the unpipelined step with the same rng — same distribution,
rng-deterministic, and bit-aligned at M=1 (tests/test_pipeline.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Params = Dict[str, Any]


def microbatch_count(batch: int, n_micro: int, n_stages: int) -> int:
    """Effective microbatch count: the largest divisor of ``batch`` that is
    <= the requested count (default 2*stages).  Always >= 1."""
    want = n_micro if n_micro > 0 else 2 * n_stages
    want = max(1, min(want, batch))
    for m in range(want, 0, -1):
        if batch % m == 0:
            return m
    return 1


def _per_stage(
    layers,
    layer_keys,
    xs_m: jnp.ndarray,
    pos_m: jnp.ndarray,
    msk_m: jnp.ndarray,
    *,
    block_fn: Callable,
    use_keys: bool,
    remat: bool,
):
    """Per-device body (manual over ``pipe``): the GPipe schedule.

    layers/layer_keys arrive pre-sliced to this stage's ``L/P`` chunk;
    xs_m/pos_m/msk_m are the full microbatched inputs ``[M, mb, ...]``
    (pipe-replicated).
    """
    pp = jax.lax.axis_size("pipe")
    stage = jax.lax.axis_index("pipe")
    n_micro = xs_m.shape[0]

    def stage_fn(x, pos, msk):
        def body(x, sl):
            lp, lk = sl
            return block_fn(lp, x, pos, msk, lk if use_keys else None), None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, (layers, layer_keys))
        return x

    perm = [(i, (i + 1) % pp) for i in range(pp)]
    # scan carries become pipe-varying after the first rotation; start them
    # varying explicitly (jax>=0.8 vma discipline)
    vary = lambda a: jax.lax.pcast(a, ("pipe",), to="varying")  # noqa: E731
    act = vary(jnp.zeros_like(xs_m[0]))
    pos = vary(jnp.zeros_like(pos_m[0]))
    msk = vary(jnp.zeros_like(msk_m[0]))
    outs = vary(jnp.zeros_like(xs_m))

    def step_fn(carry, t):
        act, pos, msk, outs = carry
        tm = jnp.clip(t, 0, n_micro - 1)
        # stage 0 feeds microbatch t (bubble steps recycle the last one;
        # their results never reach stage P-1 inside the loop)
        inject = (stage == 0) & (t < n_micro)
        act = jnp.where(
            inject, jax.lax.dynamic_index_in_dim(xs_m, tm, 0, False), act
        )
        pos = jnp.where(
            inject, jax.lax.dynamic_index_in_dim(pos_m, tm, 0, False), pos
        )
        msk = jnp.where(
            inject, jax.lax.dynamic_index_in_dim(msk_m, tm, 0, False), msk
        )

        act = stage_fn(act, pos, msk)

        # stage P-1 finished microbatch t-(P-1) this step
        oi = t - (pp - 1)
        om = jnp.clip(oi, 0, n_micro - 1)
        write = (stage == pp - 1) & (oi >= 0)
        cur = jax.lax.dynamic_index_in_dim(outs, om, 0, False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(write, act, cur), om, 0
        )

        act = jax.lax.ppermute(act, "pipe", perm)
        pos = jax.lax.ppermute(pos, "pipe", perm)
        msk = jax.lax.ppermute(msk, "pipe", perm)
        return (act, pos, msk, outs), None

    (_, _, _, outs), _ = jax.lax.scan(
        step_fn, (act, pos, msk, outs), jnp.arange(n_micro + pp - 1)
    )
    # only stage P-1 wrote non-zeros: psum replicates the result
    return jax.lax.psum(outs, "pipe")


def pipeline_apply(
    mesh: Mesh,
    block_fn: Callable,
    layers: Params,
    x: jnp.ndarray,
    positions: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    layer_keys=None,
    *,
    n_micro: int = 0,
    remat: bool = False,
) -> jnp.ndarray:
    """Run ``x`` through the whole stacked-layer sequence, pipelined.

    block_fn(layer_params, x, positions, mask, layer_key) -> x applies ONE
    decoder block.  ``layers`` is a pytree whose every leaf has leading
    layer axis L (L % mesh.shape['pipe'] == 0); ``x`` is ``[B, S, H]``,
    ``positions`` ``[B, S]``, ``mask`` ``[B, T]`` (or None = all-valid),
    ``layer_keys`` an optional ``[L]`` PRNG-key array (LoRA dropout).
    """
    pp = mesh.shape["pipe"]
    n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    if n_layers % pp != 0:
        raise ValueError(
            f"pipeline: {n_layers} layers not divisible by pipe={pp}"
        )
    b, s = x.shape[0], x.shape[1]
    m = microbatch_count(b, n_micro, pp)
    mb = b // m

    if mask is None:
        mask = jnp.ones((b, s), jnp.bool_)
    use_keys = layer_keys is not None
    if not use_keys:
        layer_keys = jnp.zeros((n_layers,), jnp.uint32)

    xs_m = x.reshape(m, mb, *x.shape[1:])
    pos_m = positions.reshape(m, mb, positions.shape[-1])
    msk_m = mask.reshape(m, mb, mask.shape[-1])

    layer_specs = jax.tree_util.tree_map(lambda _: P("pipe"), layers)
    f = jax.shard_map(
        functools.partial(
            _per_stage, block_fn=block_fn, use_keys=use_keys, remat=remat
        ),
        mesh=mesh,
        in_specs=(layer_specs, P("pipe"), P(), P(), P()),
        out_specs=P(),
        axis_names={"pipe"},
    )
    outs = f(layers, layer_keys, xs_m, pos_m, msk_m)
    return outs.reshape(b, *x.shape[1:])
