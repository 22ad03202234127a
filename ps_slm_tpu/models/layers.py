"""Shared functional layers and init helpers."""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, weight, bias, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm computed in fp32, cast back to input dtype.

    Reference policy: the encoder always runs LN in fp32
    (``SenseVoice.py:270-282``) and the composite model patches every
    ``nn.LayerNorm`` the same way under DeepSpeed (``ps-slm.py:223-235``).

    On TPU with lane-aligned dims this dispatches to the fused Pallas kernel
    (ops/norms.py) — one HBM pass instead of fp32-cast materialization.
    """
    if weight is not None and bias is not None:
        from ps_slm_tpu.ops.norms import fused_layer_norm, norms_eligible

        if norms_eligible(x.shape[-1]):
            return fused_layer_norm(x, weight, bias, eps)
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32, bias=True):
    """torch.nn.Linear default init: kaiming-uniform weight, uniform bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {
        "kernel": jax.random.uniform(
            kw, (in_dim, out_dim), dtype, -bound, bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def ln_init(dim: int, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
