"""The jitted training/eval step, mesh-sharded.

Replaces the DeepSpeed engine inner loop (``deepspeed_utils.py:191-246``):
forward (bf16 compute) → backward → AdamW, all one XLA program under ``jit``
with GSPMD shardings.  Gradient reduction over the batch axes and
FSDP all-gathers are inserted by the compiler from the shardings — the
explicit NCCL all-reduce / reduce-scatter of the reference has no user-level
analogue here.  Metrics come back as global means (the reference needed an
explicit ``dist.all_reduce`` for this, deepspeed_utils.py:318-327).

Gradients are taken only with respect to the *trainable* partition of the
params (see training.train_state) — frozen modules (and int8-quantized
weights) sit outside autodiff entirely, exactly like requires_grad=False.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax

from ps_slm_tpu.models import tasu
from ps_slm_tpu.training.train_state import (
    TrainState, apply_gradients, combine, partition,
)


def canonical_state_shardings(state: TrainState, mesh):
    """NamedSharding pytree pinning every state leaf onto ``mesh``.

    Leaves that already carry a NamedSharding (params/opt moments placed by
    ``parallel.mesh.shard_params``) keep it; everything else (the ``step``
    scalar, optimizer counters created uncommitted by ``tx.init``) is
    replicated.  Used as explicit in/out shardings on the jitted train step
    so the compiled program is a function of the *specs*, not of how the
    incoming arrays happen to be placed — a freshly-initialized state and
    an Orbax-restored one (committed leaves) then execute the same
    executable, which is what makes resumed training bit-identical to an
    uninterrupted run on a multi-device mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    repl = NamedSharding(mesh, PartitionSpec())

    def one(leaf):
        sh = getattr(leaf, "sharding", None)
        return sh if isinstance(sh, NamedSharding) else repl

    return jax.tree_util.tree_map(one, state)


def make_train_step(
    model: "tasu.TasuModel", tx, trainable: Optional[Dict] = None,
    state_shardings=None,
) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics).

    ``state_shardings`` (see :func:`canonical_state_shardings`) pins the
    state argument/result shardings; it also removes the hidden step-0 →
    step-1 recompile (uncommitted scalars in the fresh state otherwise give
    the first call a different signature than subsequent ones).
    """
    if trainable is None:
        trainable = jax.tree_util.tree_map(lambda _: True, model.params)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        train_part, frozen_part = partition(state.params, trainable)

        def loss_fn(tp):
            params = combine(tp, frozen_part)
            loss, aux = tasu.forward(model, params, batch, rng)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_part
        )
        new_state = apply_gradients(state, grads, tx, trainable)
        metrics = {"loss": loss, "acc": aux["acc"], "ntokens": aux["ntokens"]}
        return new_state, metrics

    kw = {}
    if state_shardings is not None:
        kw = dict(
            in_shardings=(state_shardings, None, None),
            out_shardings=(state_shardings, None),
        )
    return jax.jit(train_step, donate_argnums=(0,), **kw)


def make_eval_step(model: "tasu.TasuModel") -> Callable:
    def eval_step(params, batch):
        # train=False = torch model.eval(): LoRA dropout / dither /
        # SpecAugment off.  The fixed key keeps gt_emb_noise (which the
        # reference applies unconditionally in forward) deterministic.
        loss, aux = tasu.forward(
            model, params, batch, jax.random.PRNGKey(0), train=False
        )
        return {"loss": loss, "acc": aux["acc"], "ntokens": aux["ntokens"]}

    return jax.jit(eval_step)
