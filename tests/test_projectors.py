"""Projector zoo unit tests (shapes, downsampling semantics, gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.config import ModelConfig
from ps_slm_tpu.models import projector as proj


def _cfg(name, enc=24, llm=32, k=2, **kw):
    return ModelConfig(
        encoder_projector=name, encoder_dim=enc, llm_dim=llm,
        encoder_projector_ds_rate=k, **kw,
    )


def test_frame_concat_discards_tail():
    x = jnp.arange(2 * 7 * 3, dtype=jnp.float32).reshape(2, 7, 3)
    y = proj.frame_concat(x, 2)
    assert y.shape == (2, 3, 6)  # 7 -> discard 1 (projector.py:19-24)
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(x[0, :2]).reshape(-1))


@pytest.mark.parametrize("name,out_dim,t_out", [
    ("simple_linear", 32, 5),
    ("linear", 32, 5),
    ("cov1d-linear", 32, 5),
    ("linear-silu", 32, 10),
])
def test_shapes_and_grads(name, out_dim, t_out):
    cfg = _cfg(name)
    p = proj.init_projector(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 10, 24)).astype(np.float32)
    )
    y = proj.apply_projector(p, cfg, x)
    assert y.shape == (2, t_out, out_dim)

    g = jax.grad(
        lambda pp: jnp.sum(proj.apply_projector(pp, cfg, x) ** 2)
    )(p)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.slow
def test_qformer_outputs_query_len():
    cfg = _cfg("q-former", qformer_layers=2, query_len=8)
    p = proj.init_projector(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 12, 24)).astype(np.float32)
    )
    atts = jnp.ones((2, 12), bool)
    y = proj.apply_qformer(p, cfg, x, atts)
    assert y.shape == (2, 8, 32)  # fixed query_len output
    # masking changes the output
    atts2 = atts.at[:, 6:].set(False)
    y2 = proj.apply_qformer(p, cfg, x, atts2)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_cross_attention_chunking_invariance():
    """Online-softmax vocab chunking must not change the result."""
    cfg = _cfg("cross-attention", enc=8, llm=16)
    p = proj.init_cross_attention(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    post = jnp.asarray(rng.normal(size=(1, 5, 8)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    y1 = proj.apply_cross_attention(p, cfg, post, emb, chunk=7)
    y2 = proj.apply_cross_attention(p, cfg, post, emb, chunk=64)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_downsample_rate():
    assert proj.downsample_rate(_cfg("linear-silu", k=4)) == 1
    assert proj.downsample_rate(_cfg("cross-attention", k=4)) == 1
    assert proj.downsample_rate(_cfg("linear", k=4)) == 4
