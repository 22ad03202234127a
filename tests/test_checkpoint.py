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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_qformer_keymap_roundtrip():
    """q-former reference keymap (VERDICT r1 missing item 7): our pytree ->
    HF Blip2QFormer state-dict names -> back, bit-identical."""
    from ps_slm_tpu.models import projector as proj

    cfg = ModelConfig(
        encoder_projector="q-former", encoder_dim=16, llm_dim=24,
        qformer_layers=3, qformer_heads=4, query_len=4,
    )
    p = proj.init_qformer(
        jax.random.PRNGKey(0), cfg, hidden=32, intermediate=64,
    )
    tensors = ckpt.projector_to_reference(p, "q-former")
    # every exported name is in the HF layout
    for name in tensors:
        assert name.startswith("encoder_projector.")
        assert any(
            s in name for s in ("query", "qformer.", "linear.", "norm.")
        ), name
    # cross-attention present on layers 0 and 2 only (frequency 2)
    assert "encoder_projector.qformer.encoder.layer.0.crossattention.attention.key.weight" in tensors
    assert "encoder_projector.qformer.encoder.layer.1.crossattention.attention.key.weight" not in tensors
    assert "encoder_projector.qformer.encoder.layer.2.crossattention.attention.key.weight" in tensors

    p2 = proj.init_qformer(
        jax.random.PRNGKey(7), cfg, hidden=32, intermediate=64,
    )
    out, loaded = ckpt.reference_to_projector(tensors, p2, "q-former")
    assert sorted(loaded) == sorted(tensors)
    for a, b in zip(
        jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(out)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_qformer_activation_parity_vs_hf():
    """Our apply_qformer vs the actual transformers Blip2QFormerModel with
    weights moved through the reference keymap (reference wrapper
    projector.py:76-101: query -> qformer -> linear -> norm)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    from ps_slm_tpu.models import projector as proj

    enc_dim, llm_dim, hidden, heads, inter, layers, qlen = 16, 24, 32, 4, 64, 3, 4
    cfg = ModelConfig(
        encoder_projector="q-former", encoder_dim=enc_dim, llm_dim=llm_dim,
        qformer_layers=layers, qformer_heads=heads, query_len=qlen,
    )

    torch.manual_seed(0)
    qcfg = Blip2QFormerConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=inter, encoder_hidden_size=enc_dim,
    )
    tmodel = Blip2QFormerModel(qcfg).eval()
    query = torch.randn(1, qlen, hidden)
    lin = torch.nn.Linear(hidden, llm_dim)
    norm = torch.nn.LayerNorm(llm_dim, eps=1e-5)

    tensors = {f"encoder_projector.qformer.{k}": v.detach().numpy()
               for k, v in tmodel.state_dict().items()}
    tensors["encoder_projector.query"] = query.detach().numpy()
    tensors["encoder_projector.linear.weight"] = lin.weight.detach().numpy()
    tensors["encoder_projector.linear.bias"] = lin.bias.detach().numpy()
    tensors["encoder_projector.norm.weight"] = norm.weight.detach().numpy()
    tensors["encoder_projector.norm.bias"] = norm.bias.detach().numpy()

    p = proj.init_qformer(
        jax.random.PRNGKey(0), cfg, hidden=hidden, heads=heads,
        intermediate=inter,
    )
    p, loaded = ckpt.reference_to_projector(tensors, p, "q-former")
    # intermediate/output (non-query) HF branches are unused by the reference
    # forward (query tokens only) and intentionally unmapped
    unmapped = set(tensors) - set(loaded)
    assert all(".intermediate." in k or ".output." in k for k in unmapped)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 10, enc_dim)).astype(np.float32)
    atts = np.ones((2, 10), bool)
    atts[1, 7:] = False

    with torch.no_grad():
        tq = query.expand(2, -1, -1)
        tout = tmodel(
            query_embeds=tq,
            encoder_hidden_states=torch.from_numpy(x),
            encoder_attention_mask=torch.from_numpy(atts.astype(np.int64)),
            return_dict=True,
        ).last_hidden_state
        tref = norm(lin(tout)).numpy()

    ours = np.asarray(proj.apply_qformer(
        p, cfg, jnp.asarray(x), jnp.asarray(atts)
    ))
    np.testing.assert_allclose(ours, tref, atol=2e-5, rtol=1e-4)


def test_encoder_import_honesty(tmp_path):
    """strict=False honesty for the encoder branch (mirrors the llm one):
    unrecognized encoder.* keys are never reported as loaded, and a
    partial encoder checkpoint raises a clear per-module error instead of
    a raw mapper KeyError."""
    a = _model(seed=0)
    b = _model(seed=1)
    path = str(tmp_path / "full.bin")
    tensors = ckpt.export_reference_checkpoint(a, path)

    stray = dict(tensors)
    stray["encoder.some_renamed.weight"] = np.zeros((2, 2), np.float32)
    loaded = ckpt.import_reference_checkpoint(b, stray)
    assert "encoder.some_renamed.weight" not in loaded
    enc_keys = [
        k for k in tensors
        if k.startswith("encoder.") and not k.startswith("encoder_projector.")
    ]
    assert enc_keys and all(k in loaded for k in enc_keys)

    partial = {
        k: v for k, v in tensors.items() if k != "encoder.ctc.ctc_lo.weight"
    }
    with pytest.raises(KeyError, match="partial encoder checkpoint"):
        ckpt.import_reference_checkpoint(_model(seed=2), partial)
