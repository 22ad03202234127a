"""Optimizer + train state: AdamW, warmup-cosine, module freezing, grad accum.

TPU-native equivalent of the DeepSpeed engine config
(``Multitask/conf/ds_config.json``): AdamW(lr 5e-5, betas .9/.999, eps 1e-6)
+ WarmupCosineLR(200/15000).  ZeRO-style optimizer-state sharding is done by
the mesh layer (:mod:`ps_slm_tpu.parallel`) via sharding constraints — optax
state inherits the param shardings, so "stage 1/2" falls out of pjit.

Freezing uses ``optax.masked`` driven by :func:`models.tasu.trainable_mask`
(reference freeze flags, ps-slm.py:35-38,105-108; PEFT at :114-125).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

Params = Dict[str, Any]


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Params
    opt_state: Any


def warmup_cosine(lr: float, warmup_steps: int, total_steps: int,
                  min_ratio: float = 1e-4) -> optax.Schedule:
    """DeepSpeed WarmupCosineLR semantics (ds_config.json:22-27)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=lr * min_ratio,
    )


def build_optimizer(train_config, trainable: Optional[Params] = None):
    """AdamW + schedule (+ freeze mask + grad clipping)."""
    schedule = warmup_cosine(
        train_config.lr, train_config.warmup_steps, train_config.total_steps
    )
    tx = optax.adamw(
        learning_rate=schedule,
        b1=train_config.adam_beta1,
        b2=train_config.adam_beta2,
        eps=train_config.adam_eps,
        weight_decay=train_config.weight_decay,
    )
    if trainable is not None:
        # frozen leaves must get *zero* updates (optax.masked would pass raw
        # gradients through unchanged for masked-out leaves)
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    if train_config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=train_config.gradient_accumulation_steps
        )
    return tx, schedule


def create_train_state(params: Params, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def apply_gradients(state: TrainState, grads: Params, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, new_params, new_opt)
