"""Edge cases: zero-length spans, fully-dropped PSD, empty GT text,
single-frame audio — paths where static-shape masking must not blow up."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.config import ModelConfig, TrainConfig
from ps_slm_tpu.models.tasu import forward, model_factory
from ps_slm_tpu.ops.merge import merge_audio_text
from ps_slm_tpu.ops.psd import psd
from ps_slm_tpu.ops.pseudo_posterior import pseudo_posterior_noise

SPEECH = 250


def test_merge_zero_length_audio_span():
    """A row whose audio collapsed to zero frames still merges cleanly."""
    rng = np.random.default_rng(0)
    b, s, a, e = 2, 6, 4, 3
    ids = np.full((b, s), 7, np.int32)
    ids[:, 2] = SPEECH
    m = merge_audio_text(
        jnp.asarray(rng.normal(size=(b, a, e)).astype(np.float32)),
        jnp.asarray([0, 3]),          # row 0: zero audio frames
        jnp.asarray(rng.normal(size=(b, s, e)).astype(np.float32)),
        jnp.asarray(ids), jnp.ones((b, s), bool),
        jnp.asarray(ids, np.int32),
        speech_token_id=SPEECH, left_padding=False,
    )
    counts = np.asarray(m.attention_mask).sum(-1)
    np.testing.assert_array_equal(counts, [s - 1, s - 1 + 3])
    assert np.isfinite(np.asarray(m.embeds)).all()


def test_psd_drops_everything():
    """All frames blank above threshold -> new_len 0, zero output."""
    b, t, v = 1, 8, 4
    probs = np.zeros((b, t, v), np.float32)
    probs[..., 0] = 0.95              # blank dominates everywhere
    probs[..., 1] = 0.05
    out, lens = psd(
        jnp.asarray(probs), jnp.asarray([t]), jnp.asarray(probs),
        blank_id=0, blank_threshold=0.9,
    )
    assert int(lens[0]) == 0
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_noise_keeps_at_least_shape_with_len_zero():
    post, lens = pseudo_posterior_noise(
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([0]),
        jax.random.PRNGKey(0), vocab_size=5,
    )
    assert int(lens[0]) == 0
    np.testing.assert_allclose(np.asarray(post), 0.0)


def test_forward_with_empty_gt_row():
    """Text-only TASU with one empty-GT row (gt_lens 0) stays finite."""
    tc = TrainConfig(ctc_posterior=True, gt_emb=True)
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    model.speech_token_id = SPEECH
    model.use_flash = False

    rng = np.random.default_rng(1)
    b, s = 2, 8
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 2] = SPEECH
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), bool),
        "labels": jnp.asarray(np.where(np.arange(s)[None] < 4, -100, ids)),
        "gt_ids": jnp.asarray(rng.integers(1, 11, size=(b, 5)).astype(np.int32)),
        "gt_lens": jnp.asarray([0, 5]),   # row 0 has no GT text
    }
    loss, metrics = forward(model, model.params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_forward_single_frame_audio():
    tc = TrainConfig(ctc_posterior=True, do_psd=True)
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    model.speech_token_id = SPEECH
    model.use_flash = False

    rng = np.random.default_rng(2)
    b, s, a = 2, 8, 4
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 2] = SPEECH
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), bool),
        "labels": jnp.asarray(np.where(np.arange(s)[None] < 4, -100, ids)),
        "input_features": jnp.asarray(
            rng.normal(size=(b, a, 24)).astype(np.float32)
        ),
        "input_feature_length": jnp.asarray([1, a]),  # one-frame row
    }
    loss, _ = forward(model, model.params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_all_labels_ignored_row():
    """A row with nothing to predict must not produce NaN loss."""
    tc = TrainConfig(ctc_posterior=True, gt_emb=True)
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    model.speech_token_id = SPEECH
    model.use_flash = False
    rng = np.random.default_rng(3)
    b, s = 2, 8
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 2] = SPEECH
    labels = np.where(np.arange(s)[None] < 4, -100, ids)
    labels[0, :] = -100               # entire row ignored
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), bool),
        "labels": jnp.asarray(labels),
        "gt_ids": jnp.asarray(rng.integers(1, 11, size=(b, 5)).astype(np.int32)),
        "gt_lens": jnp.asarray([5, 5]),
    }
    loss, _ = forward(model, model.params, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
