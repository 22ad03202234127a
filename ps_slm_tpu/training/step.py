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


def make_train_step(
    model: "tasu.TasuModel", tx, trainable: Optional[Dict] = None
) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics)."""
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

    return jax.jit(train_step, donate_argnums=(0,))


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
