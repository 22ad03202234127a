"""Masked token accuracy (reference ``Multitask/utils/metric.py:3-20``)."""

from __future__ import annotations

import jax.numpy as jnp


def compute_accuracy(
    pad_outputs: jnp.ndarray,   # [B, L] predicted ids
    pad_targets: jnp.ndarray,   # [B, L] target ids
    ignore_label: int = -100,
) -> jnp.ndarray:
    """Accuracy over positions where target != ignore_label."""
    mask = pad_targets != ignore_label
    num = jnp.sum((pad_outputs == pad_targets) & mask)
    den = jnp.maximum(jnp.sum(mask), 1)
    return num / den
