"""Flash-attention kernel parity vs the XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.ops.attention import mha_reference
from ps_slm_tpu.ops.flash_attention import flash_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2)])
def test_forward_parity(causal, hq, hkv):
    b, s, d = 2, 64, 32
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = _rand((b, s, hq, d), keys[0])
    k = _rand((b, s, hkv, d), keys[1])
    v = _rand((b, s, hkv, d), keys[2])
    lens = jnp.array([s, s - 17])
    kv_mask = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1) < lens[:, None]

    ref = mha_reference(q, k, v, kv_mask=kv_mask, causal=causal)
    out = flash_attention(
        q, k, v, kv_mask=kv_mask, causal=causal, block_q=16, block_k=16
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_forward_left_padding():
    """Left-padded prefill: valid window is a suffix."""
    b, s, hq, hkv, d = 2, 48, 2, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand((b, s, hq, d), keys[0])
    k = _rand((b, s, hkv, d), keys[1])
    v = _rand((b, s, hkv, d), keys[2])
    starts = jnp.array([0, 13])
    kv_mask = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1) >= starts[:, None]

    ref = mha_reference(q, k, v, kv_mask=kv_mask, causal=True)
    out = flash_attention(
        q, k, v, kv_mask=kv_mask, causal=True, block_q=16, block_k=16
    )
    # rows whose causal+pad mask is empty differ (ref gives uniform-softmax rows
    # zeroed; flash gives zeros) — both are zero, so direct compare is fine.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grad_parity(causal):
    b, s, hq, hkv, d = 1, 32, 2, 1, 16
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    q = _rand((b, s, hq, d), keys[0])
    k = _rand((b, s, hkv, d), keys[1])
    v = _rand((b, s, hkv, d), keys[2])
    lens = jnp.array([s - 5])
    kv_mask = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1) < lens[:, None]
    g = _rand((b, s, hq, d), keys[3])

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, kv_mask=kv_mask, causal=causal) * g)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, kv_mask=kv_mask, causal=causal, block_q=16, block_k=16
            )
            * g
        )

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-4, rtol=1e-4)


def test_unpadded_seq_lengths():
    """S not a multiple of the block size exercises the pad/slice wrapper."""
    b, s, h, d = 1, 50, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q = _rand((b, s, h, d), keys[0])
    k = _rand((b, s, h, d), keys[1])
    v = _rand((b, s, h, d), keys[2])
    kv_mask = jnp.ones((b, s), bool)
    ref = mha_reference(q, k, v, kv_mask=kv_mask, causal=True)
    out = flash_attention(
        q, k, v, kv_mask=kv_mask, causal=True, block_q=16, block_k=16
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_default_blocks_clamp_to_short_sequences():
    """Default 512-blocks must clamp for short inputs."""
    b, s, h, d = 1, 40, 2, 32
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    q = _rand((b, s, h, d), keys[0])
    k = _rand((b, s, h, d), keys[1])
    v = _rand((b, s, h, d), keys[2])
    mask = jnp.ones((b, s), bool)
    ref = mha_reference(q, k, v, kv_mask=mask, causal=True)
    out = flash_attention(q, k, v, kv_mask=mask, causal=True)  # defaults
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mha_core_custom_vjp_matches_autodiff(dtype):
    """mha_reference stashes probs in v.dtype (bf16 on TPU) via custom_vjp;
    gradients must match plain autodiff through identical forward math."""
    from ps_slm_tpu.ops.attention import _mha_probs

    rng = np.random.default_rng(11)
    b, s, hq, hkv, d = 2, 17, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), dtype)
    g = jnp.asarray(rng.normal(size=(b, s, hq, d)), dtype)
    kv_mask = jnp.asarray(rng.uniform(size=(b, s)) > 0.2)

    def autodiff_ref(q, k, v):
        scale = d ** -0.5
        qg = q.reshape(b, s, hkv, hq // hkv, d)
        mask = kv_mask[:, None, None, None, :]
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (b, s, s), 1)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (b, s, s), 2)
        causal = (kv_pos <= q_pos)[:, None, None, :, :]
        mask = jnp.logical_and(mask, causal)
        probs = _mha_probs(qg, k, mask, scale).astype(v.dtype)
        out = jnp.einsum("bkrst,btkd->bskrd", probs, v)
        return out.reshape(b, s, hq, d).astype(q.dtype)

    def custom(q, k, v):
        return mha_reference(q, k, v, kv_mask=kv_mask, causal=True)

    np.testing.assert_allclose(
        np.asarray(custom(q, k, v), np.float32),
        np.asarray(autodiff_ref(q, k, v), np.float32), atol=1e-6,
    )
    loss = lambda f: lambda q, k, v: jnp.sum((f(q, k, v) * g).astype(jnp.float32))
    ga = jax.grad(loss(autodiff_ref), argnums=(0, 1, 2))(q, k, v)
    gc = jax.grad(loss(custom), argnums=(0, 1, 2))(q, k, v)
    tol = 2e-5 if dtype == jnp.float32 else 1e-1
    for a, c in zip(ga, gc):
        np.testing.assert_allclose(
            np.asarray(c, np.float32), np.asarray(a, np.float32), atol=tol
        )
