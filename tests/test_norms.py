"""Fused Pallas norms vs the jnp reference (fwd + grads, interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.ops.norms import fused_layer_norm, fused_rms_norm


def _ln_ref(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def _rms_ref(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, -1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


@pytest.mark.parametrize("shape", [(2, 7, 128), (3, 256), (1, 300, 256)])
def test_ln_forward(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(1 + 0.1 * rng.normal(size=shape[-1]).astype(np.float32))
    b = jnp.asarray(0.1 * rng.normal(size=shape[-1]).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_layer_norm(x, w, b)), np.asarray(_ln_ref(x, w, b)),
        atol=1e-5, rtol=1e-5,
    )


def test_ln_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 9, 128)).astype(np.float32))
    w = jnp.asarray(1 + 0.1 * rng.normal(size=128).astype(np.float32))
    b = jnp.asarray(0.1 * rng.normal(size=128).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 9, 128)).astype(np.float32))

    def loss_f(fn):
        return lambda x, w, b: jnp.sum(fn(x, w, b) * g)

    gr = jax.grad(loss_f(_ln_ref), argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss_f(fused_layer_norm), argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=2e-4)


@pytest.mark.parametrize("shape", [(2, 7, 128), (4, 256)])
def test_rms_forward(shape):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(1 + 0.1 * rng.normal(size=shape[-1]).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_rms_norm(x, w)), np.asarray(_rms_ref(x, w)),
        atol=1e-5, rtol=1e-5,
    )


def test_rms_grads():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(3, 5, 128)).astype(np.float32))
    w = jnp.asarray(1 + 0.1 * rng.normal(size=128).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(3, 5, 128)).astype(np.float32))
    gr = jax.grad(
        lambda x, w: jnp.sum(_rms_ref(x, w) * g), argnums=(0, 1)
    )(x, w)
    gf = jax.grad(
        lambda x, w: jnp.sum(fused_rms_norm(x, w) * g), argnums=(0, 1)
    )(x, w)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=2e-4)


def test_bf16_roundtrip():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 300, 128)), jnp.bfloat16)
    w = jnp.ones(128, jnp.bfloat16)
    b = jnp.zeros(128, jnp.bfloat16)
    y = fused_layer_norm(x, w, b)
    assert y.dtype == jnp.bfloat16
    ref = _ln_ref(x, w, b)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rms_ref_custom_vjp_matches_autodiff(dtype):
    """rms_norm_ref stashes (x, rstd) instead of the fp32 upcast; its
    gradients must equal plain autodiff through the same math."""
    from ps_slm_tpu.ops.norms import rms_norm_ref

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 9, 128)), dtype)
    w = jnp.asarray(1 + 0.1 * rng.normal(size=128), dtype)
    g = jnp.asarray(rng.normal(size=(2, 9, 128)), dtype)

    y = rms_norm_ref(x, w)
    assert y.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(_rms_ref(x, w), np.float32),
        atol=1e-6 if dtype == jnp.float32 else 2e-2,
    )

    ga = jax.grad(
        lambda x, w: jnp.sum((_rms_ref(x, w) * g).astype(jnp.float32)),
        argnums=(0, 1),
    )(x, w)
    gc = jax.grad(
        lambda x, w: jnp.sum((rms_norm_ref(x, w) * g).astype(jnp.float32)),
        argnums=(0, 1),
    )(x, w)
    tol = 1e-5 if dtype == jnp.float32 else 6e-2
    for a, c in zip(ga, gc):
        np.testing.assert_allclose(
            np.asarray(c, np.float32), np.asarray(a, np.float32), atol=tol
        )
