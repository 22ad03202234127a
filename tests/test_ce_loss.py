"""Chunked CE == naive full-logit CE (loss, grads, accuracy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.ops.ce_loss import chunked_ce_loss


def _naive(hidden, w, labels, ignore=-100):
    logits = (hidden @ w).astype(jnp.float32)
    sl = logits[:, :-1]
    y = labels[:, 1:]
    valid = y != ignore
    safe = jnp.where(valid, y, 0)
    logp = jax.nn.log_softmax(sl, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, ll, 0.0)) / n
    acc = jnp.sum((jnp.argmax(sl, -1) == safe) & valid) / n
    return loss, acc, jnp.sum(valid)


@pytest.mark.parametrize("t,chunk", [(9, 4), (16, 8), (7, 16)])
def test_matches_naive(t, chunk):
    rng = np.random.default_rng(0)
    b, h, v = 2, 16, 37
    hidden = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(h, v)).astype(np.float32))
    labels = rng.integers(0, v, size=(b, t)).astype(np.int32)
    labels[0, :3] = -100
    labels[1, -2:] = -100
    labels = jnp.asarray(labels)

    l1, a1, n1 = _naive(hidden, w, labels)
    l2, a2, n2 = chunked_ce_loss(hidden, w, labels, chunk=chunk)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(a2), float(a1), rtol=1e-6)
    assert int(n1) == int(n2)


def test_grads_match_naive():
    rng = np.random.default_rng(1)
    b, t, h, v = 2, 10, 8, 21
    hidden = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(h, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, v, size=(b, t)).astype(np.int32))

    g1 = jax.grad(lambda hh, ww: _naive(hh, ww, labels)[0], argnums=(0, 1))(
        hidden, w
    )
    g2 = jax.grad(
        lambda hh, ww: chunked_ce_loss(hh, ww, labels, chunk=4)[0],
        argnums=(0, 1),
    )(hidden, w)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-5)


def test_all_ignored():
    hidden = jnp.zeros((1, 4, 8))
    w = jnp.zeros((8, 5))
    labels = jnp.full((1, 4), -100, jnp.int32)
    loss, acc, n = chunked_ce_loss(hidden, w, labels)
    assert float(loss) == 0.0 and int(n) == 0


def test_gathered_matches_naive_values_and_grads():
    """Merged-TASU-shaped labels: a long -100 audio span, few text labels."""
    from ps_slm_tpu.ops.ce_loss import gathered_ce_loss

    rng = np.random.default_rng(2)
    b, t, h, v = 3, 40, 8, 29
    hidden = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(h, v)).astype(np.float32))
    labels = np.full((b, t), -100, np.int32)
    # audio span [0, 30) ignored; text labels at the tail, ragged per row
    for i, n_lab in enumerate((6, 9, 3)):
        labels[i, 30:30 + n_lab] = rng.integers(0, v, size=n_lab)
    labels = jnp.asarray(labels)

    l1, a1, n1 = _naive(hidden, w, labels)
    # max_valid is a per-row bound (largest row has 9 valid labels)
    for max_valid in (9, 16, t - 1):
        l2, a2, n2 = gathered_ce_loss(hidden, w, labels, max_valid=max_valid)
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
        np.testing.assert_allclose(float(a2), float(a1), rtol=1e-6)
        assert int(n1) == int(n2)

    g1 = jax.grad(lambda hh, ww: _naive(hh, ww, labels)[0], argnums=(0, 1))(
        hidden, w
    )
    g2 = jax.grad(
        lambda hh, ww: gathered_ce_loss(hh, ww, labels, max_valid=32)[0],
        argnums=(0, 1),
    )(hidden, w)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-5)


def test_gathered_all_ignored():
    from ps_slm_tpu.ops.ce_loss import gathered_ce_loss

    hidden = jnp.zeros((1, 6, 8))
    w = jnp.zeros((8, 5))
    labels = jnp.full((1, 6), -100, jnp.int32)
    loss, acc, n = gathered_ce_loss(hidden, w, labels, max_valid=4)
    assert float(loss) == 0.0 and int(n) == 0
