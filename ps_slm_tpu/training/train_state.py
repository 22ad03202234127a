"""Optimizer + train state: AdamW, warmup-cosine, module freezing, grad accum.

TPU-native equivalent of the DeepSpeed engine config
(``Multitask/conf/ds_config.json``): AdamW(lr 5e-5, betas .9/.999, eps 1e-6)
+ WarmupCosineLR(200/15000).  ZeRO-style optimizer-state sharding is done by
the mesh layer (:mod:`ps_slm_tpu.parallel`) via sharding constraints — optax
state inherits the param shardings, so "stage 1/2" falls out of pjit.

Freezing uses **partitioning** (reference freeze flags, ps-slm.py:35-38,
105-108; PEFT at :114-125): params are split into trainable/frozen subtrees;
gradients and optimizer state exist only for the trainable part — no Adam
moments are ever allocated for frozen modules (like DeepSpeed with
requires_grad=False params), and non-differentiable leaves (int8 quantized
weights) are never touched by autodiff.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Params = Dict[str, Any]


def partition(params: Params, mask: Params) -> Tuple[Params, Params]:
    """Split by boolean mask -> (trainable, frozen); None marks holes."""
    train = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def combine(a: Params, b: Params) -> Params:
    """Inverse of :func:`partition` (first non-None wins)."""
    return jax.tree_util.tree_map(
        lambda x, y: y if x is None else x, a, b,
        is_leaf=lambda v: v is None,
    )


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Params          # FULL param tree (trainable + frozen)
    opt_state: Any          # optimizer state over the trainable subtree only


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
    """AdamW + schedule (+ grad accumulation).

    `trainable` is accepted for API symmetry; partitioning happens in the
    step/state constructors, so the transform itself is unmasked.
    """
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
    if train_config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=train_config.gradient_accumulation_steps
        )
    return tx, schedule


def create_train_state(
    params: Params, tx, trainable: Optional[Params] = None
) -> TrainState:
    if trainable is None:
        trainable = jax.tree_util.tree_map(lambda _: True, params)
    train_part, _ = partition(params, trainable)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(train_part),
    )


def apply_gradients(
    state: TrainState, grads: Params, tx, trainable: Params
) -> TrainState:
    """grads is a trainable-subtree pytree (holes = None)."""
    train_part, frozen_part = partition(state.params, trainable)
    updates, new_opt = tx.update(grads, state.opt_state, train_part)
    new_train = optax.apply_updates(train_part, updates)
    return TrainState(
        state.step + 1, combine(new_train, frozen_part), new_opt
    )
