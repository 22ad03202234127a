"""Checkpoint subsystem: reference-format export/import round trip, funasr
encoder loading, ctc_linear head loading, Orbax train-state resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.config import ModelConfig, TrainConfig
from ps_slm_tpu.models.tasu import forward, model_factory
from ps_slm_tpu.training import checkpoint as ckpt

SPEECH = 250


def _model(seed=0, **tk):
    tc = TrainConfig(ctc_posterior=True, gt_emb=True, **tk)
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
    )
    m = model_factory(tc, mc, rng=jax.random.PRNGKey(seed))
    m.speech_token_id = SPEECH
    m.use_flash = False
    return m


def _batch():
    rng = np.random.default_rng(0)
    b, s = 2, 10
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 3] = SPEECH
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), bool),
        "labels": jnp.asarray(np.where(np.arange(s)[None] < 5, -100, ids)),
        "gt_ids": jnp.asarray(rng.integers(1, 11, size=(b, 6)).astype(np.int32)),
        "gt_lens": jnp.asarray([6, 4]),
    }


def test_reference_export_import_roundtrip(tmp_path):
    """model A -> pytorch_model.bin -> model B: identical forward."""
    a = _model(seed=0)
    b = _model(seed=1)  # different random init
    batch = _batch()
    loss_a, _ = forward(a, a.params, batch, jax.random.PRNGKey(2))
    loss_b0, _ = forward(b, b.params, batch, jax.random.PRNGKey(2))
    assert abs(float(loss_a) - float(loss_b0)) > 1e-4  # genuinely different

    path = str(tmp_path / "pytorch_model.bin")
    tensors = ckpt.export_reference_checkpoint(a, path)
    # composite key layout (ps-slm.py:163-170 load contract)
    assert any(k.startswith("llm.model.layers.0.") for k in tensors)
    assert any(k.startswith("encoder.encoder.encoders0.0.") for k in tensors)
    assert "encoder_projector.ffn.0.weight" in tensors
    assert "encoder.ctc.ctc_lo.weight" in tensors

    loaded = ckpt.import_reference_checkpoint(b, path)
    assert len(loaded) > 10
    loss_b1, _ = forward(b, b.params, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(loss_b1), float(loss_a), rtol=1e-5)


def test_partial_import_strict_false(tmp_path):
    """Projector-only checkpoint loads into a full model (strict=False)."""
    a = _model(seed=0)
    b = _model(seed=1)
    path = str(tmp_path / "proj_only.bin")
    ckpt.export_reference_checkpoint(a, path, exclude=("llm", "encoder"))
    loaded = ckpt.import_reference_checkpoint(b, path)
    assert all(k.startswith("encoder_projector.") for k in loaded)
    np.testing.assert_allclose(
        np.asarray(b.params["projector"]["ffn1"]["kernel"]),
        np.asarray(a.params["projector"]["ffn1"]["kernel"]),
        rtol=1e-6,
    )


def test_funasr_encoder_loader(tmp_path):
    torch = pytest.importorskip("torch")
    from ps_slm_tpu.models import sensevoice as sv
    from ps_slm_tpu.training.checkpoint import load_funasr_encoder

    cfg = sv.SenseVoiceConfig.tiny()
    # build a random funasr-layout state dict via our exporter
    params = sv.init_params(jax.random.PRNGKey(0), cfg)
    from ps_slm_tpu.training.checkpoint import _encoder_to_reference

    ref = _encoder_to_reference(params, cfg)
    state = {
        k[len("encoder."):]: torch.tensor(v) for k, v in ref.items()
    }
    d = tmp_path / "SenseVoiceSmall"
    d.mkdir()
    torch.save(state, d / "model.pt")
    (d / "config.yaml").write_text(
        "input_size: 24\nvocab_size: 11\nencoder: SenseVoiceEncoderSmall\n"
        "encoder_conf:\n  output_size: 16\n  attention_heads: 2\n"
        "  linear_units: 32\n  num_blocks: 3\n  tp_blocks: 2\n"
        "  kernel_size: 5\n"
    )
    loaded, cfg2 = load_funasr_encoder(str(d))
    assert cfg2.output_size == 16 and cfg2.num_blocks == 3
    np.testing.assert_allclose(
        np.asarray(loaded["ctc_lo"]["kernel"]),
        np.asarray(params["ctc_lo"]["kernel"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded["encoders"]["qkv"]["kernel"]),
        np.asarray(params["encoders"]["qkv"]["kernel"]), rtol=1e-6,
    )


def test_ctc_linear_loader(tmp_path):
    torch = pytest.importorskip("torch")
    from ps_slm_tpu.training.checkpoint import load_ctc_linear

    w = torch.randn(64, 16)
    bvec = torch.randn(64)
    torch.save({"model": {"ctc_head.weight": w, "ctc_head.bias": bvec}},
               tmp_path / "step.pt")
    proj = {"map": {"kernel": jnp.zeros((16, 64)), "bias": jnp.zeros(64)}}
    out = load_ctc_linear(str(tmp_path / "step.pt"), proj)
    np.testing.assert_allclose(np.asarray(out["map"]["kernel"]), w.numpy().T,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["map"]["bias"]), bvec.numpy(),
                               rtol=1e-6)


def test_orbax_train_state_roundtrip(tmp_path):
    from ps_slm_tpu.models.tasu import trainable_mask
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )

    model = _model(freeze_llm=True, freeze_encoder=True)
    tc = TrainConfig(freeze_llm=True, freeze_encoder=True)
    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)

    path = str(tmp_path / "state")
    ckpt.save_train_state(path, state)
    restored = ckpt.restore_train_state(path, jax.tree_util.tree_map(
        lambda x: x, state
    ))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
