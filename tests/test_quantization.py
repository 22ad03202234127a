"""Int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from ps_slm_tpu.models.quantization import (
    dequantize_kernel, dequantize_llm, q8_matmul, quantize_kernel,
    quantize_llm,
)

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    node = quantize_kernel(w)
    assert node["q8"].dtype == jnp.int8
    back = dequantize_kernel(node)
    # per-channel int8: relative error bounded by ~1/127 of channel max
    err = np.abs(np.asarray(back) - np.asarray(w))
    bound = np.abs(np.asarray(w)).max(axis=0) / 127.0 * 0.51
    assert (err <= bound[None, :] + 1e-6).all()


def test_q8_matmul_close():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    node = quantize_kernel(w)
    got = np.asarray(q8_matmul(x, node))
    want = np.asarray(x @ w)
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)


def test_quantized_tasu_forward_close():
    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models.tasu import forward, model_factory

    def build(quant):
        tc = TrainConfig(
            ctc_posterior=True, gt_emb=True, freeze_llm=True,
            freeze_encoder=True, quantization=quant,
        )
        mc = ModelConfig(
            llm_path="", encoder_path=None, encoder_projector="linear-silu",
            encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
        )
        m = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
        m.speech_token_id = 250
        m.use_flash = False
        return m

    rng = np.random.default_rng(2)
    b, s = 2, 10
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 3] = 250
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), bool),
        "labels": jnp.asarray(np.where(np.arange(s)[None] < 5, -100, ids)),
        "gt_ids": jnp.asarray(rng.integers(1, 11, size=(b, 6)).astype(np.int32)),
        "gt_lens": jnp.asarray([6, 4]),
    }
    m_fp = build(False)
    m_q8 = build(True)
    assert "q8" in m_q8.params["llm"]["layers"]["q_proj"]
    loss_fp, _ = forward(m_fp, m_fp.params, batch, jax.random.PRNGKey(1))
    loss_q8, _ = forward(m_q8, m_q8.params, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_q8), float(loss_fp), rtol=0.05)


def test_dequantize_llm_restores_kernels():
    from ps_slm_tpu.models import qwen2

    cfg = qwen2.Qwen2Config.tiny()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    q = quantize_llm(params)
    assert "kernel" not in q["layers"]["q_proj"]
    d = dequantize_llm(q)
    assert "kernel" in d["layers"]["q_proj"]
    assert d["layers"]["q_proj"]["kernel"].shape == \
        params["layers"]["q_proj"]["kernel"].shape


def test_qlora_training_only_moves_adapters():
    """int8-frozen LLM + LoRA: training updates adapters only, loss drops."""
    import numpy as np
    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models.tasu import model_factory, trainable_mask
    from ps_slm_tpu.training.step import make_train_step
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )

    tc = TrainConfig(
        ctc_posterior=True, gt_emb=True, quantization=True, use_peft=True,
        freeze_llm=True, freeze_encoder=True, freeze_projector=True,
        lr=5e-3, warmup_steps=1, total_steps=50,
    )
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    model.speech_token_id = 250
    model.use_flash = False
    assert "q8" in model.params["llm"]["layers"]["q_proj"]
    assert "lora_a" in model.params["llm"]["layers"]["q_proj"]

    q8_before = np.asarray(
        model.params["llm"]["layers"]["q_proj"]["q8"]
    ).copy()
    lora_b_before = np.asarray(
        model.params["llm"]["layers"]["q_proj"]["lora_b"]
    ).copy()
    proj_before = np.asarray(model.params["projector"]["ffn1"]["kernel"]).copy()

    rng = np.random.default_rng(0)
    b, s = 2, 10
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 3] = 250
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), bool),
        "labels": jnp.asarray(np.where(np.arange(s)[None] < 5, -100, ids)),
        "gt_ids": jnp.asarray(rng.integers(1, 11, size=(b, 6)).astype(np.int32)),
        "gt_lens": jnp.asarray([6, 4]),
    }
    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)
    step = make_train_step(model, tx, trainable)
    losses = []
    for _ in range(15):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    np.testing.assert_array_equal(
        np.asarray(state.params["llm"]["layers"]["q_proj"]["q8"]), q8_before
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["projector"]["ffn1"]["kernel"]), proj_before
    )
    assert not np.allclose(
        np.asarray(state.params["llm"]["layers"]["q_proj"]["lora_b"]),
        lora_b_before,
    )


def test_quantization_survives_checkpoint_import(tmp_path):
    """import_reference_checkpoint replaces params['llm'] wholesale; when
    the factory quantized (train_config.quantization), the imported
    weights must be re-quantized too — otherwise serving a checkpoint
    silently drops the int8 knob."""
    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models.tasu import model_factory
    from ps_slm_tpu.training.checkpoint import (
        export_reference_checkpoint, import_reference_checkpoint,
    )

    def build(quant):
        tc = TrainConfig(
            ctc_posterior=True, gt_emb=True, freeze_llm=True,
            freeze_encoder=True, quantization=quant,
        )
        mc = ModelConfig(
            llm_path="", encoder_path=None,
            encoder_projector="linear-silu",
            encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
        )
        return model_factory(tc, mc, rng=jax.random.PRNGKey(0))

    src = build(False)
    path = str(tmp_path / "pytorch_model.bin")
    export_reference_checkpoint(src, path)

    dst = build(True)
    assert "q8" in dst.params["llm"]["layers"]["q_proj"]
    import_reference_checkpoint(dst, path, jnp.float32)
    layers = dst.params["llm"]["layers"]
    assert "q8" in layers["q_proj"], "int8 dropped by checkpoint import"
    assert "kernel" not in layers["q_proj"]
    # the imported (quantized) weights match the source within int8 error
    from ps_slm_tpu.models.quantization import dequantize_kernel

    got = np.asarray(dequantize_kernel(layers["q_proj"]))
    want = np.asarray(src.params["llm"]["layers"]["q_proj"]["kernel"])
    assert np.max(np.abs(got - want)) < np.max(np.abs(want)) / 64


def test_merge_lora_on_q8_base():
    """merge_lora folds adapters into a dequantized bf16 kernel on QLoRA
    nodes instead of KeyErroring on the missing 'kernel'."""
    from types import SimpleNamespace

    from ps_slm_tpu.models import qwen2
    from ps_slm_tpu.models.lora import add_lora, merge_lora
    from ps_slm_tpu.models.quantization import dequantize_kernel

    cfg = qwen2.Qwen2Config.tiny()
    params = quantize_llm(qwen2.init_params(jax.random.PRNGKey(0), cfg))
    peft = SimpleNamespace(r=4, lora_alpha=8, target_modules=["q_proj"])
    params = add_lora(params, peft, jax.random.PRNGKey(1))
    node = dict(params["layers"]["q_proj"])
    node["lora_b"] = jnp.full_like(node["lora_b"], 0.02)
    params["layers"]["q_proj"] = node

    merged = merge_lora(params)
    m = merged["layers"]["q_proj"]
    assert "q8" not in m and "scale" not in m and "lora_a" not in m
    assert m["kernel"].dtype == jnp.bfloat16

    want = (
        np.asarray(dequantize_kernel(node), np.float32)
        + np.einsum(
            "lir,lro->lio",
            np.asarray(node["lora_a"], np.float32),
            np.asarray(node["lora_b"], np.float32),
        ) * np.asarray(node["lora_scale"], np.float32)[:, None, None]
    )
    got = np.asarray(m["kernel"], np.float32)
    np.testing.assert_allclose(got, want, atol=0.01, rtol=0.01)
    # untouched projection is still quantized
    assert "q8" in merged["layers"]["k_proj"]


def test_lora_init_matches_peft_bound():
    """A ~ U[-1/sqrt(fan_in), 1/sqrt(fan_in)] (peft kaiming_uniform_
    a=sqrt(5)); regression: the bound was sqrt(3)x too large."""
    import math
    from types import SimpleNamespace

    from ps_slm_tpu.models import qwen2
    from ps_slm_tpu.models.lora import add_lora

    cfg = qwen2.Qwen2Config.tiny()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    peft = SimpleNamespace(r=16, lora_alpha=32, target_modules=["q_proj"])
    p = add_lora(params, peft, jax.random.PRNGKey(1))
    a = np.asarray(p["layers"]["q_proj"]["lora_a"], np.float32)
    d_in = a.shape[1]
    bound = 1.0 / math.sqrt(d_in)
    assert np.abs(a).max() <= bound + 1e-6
    assert np.abs(a).max() > 0.8 * bound          # spans the range
    assert abs(a.std() - bound / math.sqrt(3)) < 0.15 * bound
