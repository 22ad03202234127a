"""Int8 / int4 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from ps_slm_tpu.models.quantization import (
    dequantize_kernel, dequantize_kernel4, dequantize_llm, q4_matmul,
    q8_matmul, quant_spec, quantize_kernel, quantize_kernel4, quantize_llm,
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


def test_q4_roundtrip_error_groupwise():
    """Group-wise int4: error bounded by half a quantization step of the
    *group* max — strictly tighter than one per-channel step when the
    channel has a dynamic-range outlier."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    node = quantize_kernel4(w, group_size=16)
    assert node["q4"].dtype == jnp.int4
    assert node["q4"].shape == (64, 32)
    assert node["scale4"].shape == (4, 32)          # 64/16 groups
    back = np.asarray(dequantize_kernel4(node))
    wg = np.asarray(w).reshape(4, 16, 32)
    bound = np.abs(wg).max(axis=1, keepdims=True) / 7.0 * 0.51
    err = np.abs(back.reshape(4, 16, 32) - wg)
    assert (err <= bound + 1e-6).all()


def test_q4_matmul_matches_dequantized_dense():
    """q4_matmul == x @ dequantize(q4) up to fp accumulation order."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    node = quantize_kernel4(w, group_size=16)
    got = np.asarray(q4_matmul(x, node))
    want = np.asarray(x @ dequantize_kernel4(node))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # and close to the unquantized matmul: per-element error std is
    # ~sqrt(K)*step/sqrt(12) ~= 1.0 at K=64 unit-normal — bound at 4 sigma
    assert np.abs(got - np.asarray(x @ w)).max() < 4.0


def test_q4_group_fallback_when_indivisible():
    """in-features not divisible by the group size -> one full-depth group
    (tiny test models), never a crash."""
    w = jnp.asarray(np.random.default_rng(5).normal(size=(24, 8)), jnp.float32)
    node = quantize_kernel4(w, group_size=128)
    assert node["scale4"].shape == (1, 8)
    x = jnp.ones((2, 24), jnp.float32)
    got = np.asarray(q4_matmul(x, node))
    np.testing.assert_allclose(
        got, np.asarray(x @ dequantize_kernel4(node)), atol=1e-4, rtol=1e-4
    )


def test_quant_spec_detects_scheme():
    from ps_slm_tpu.models import qwen2

    cfg = qwen2.Qwen2Config.tiny()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    assert quant_spec(params) is None
    assert quant_spec(quantize_llm(params)) == (8, 0)
    d_in = params["layers"]["q_proj"]["kernel"].shape[-2]
    gs = 16 if d_in % 16 == 0 else d_in
    q4 = quantize_llm(params, bits=4, group_size=16)
    assert quant_spec(q4) == (4, gs)
    # dequantize_llm restores fp kernels from q4 nodes too
    d = dequantize_llm(q4)
    assert "kernel" in d["layers"]["q_proj"]
    assert "q4" not in d["layers"]["q_proj"]
    assert d["layers"]["q_proj"]["kernel"].shape == \
        params["layers"]["q_proj"]["kernel"].shape


def test_quantized4_tasu_forward_close():
    """TASU forward with an int4 LLM stays close to fp; int4 leaves are
    frozen by trainable_mask (non-floating dtype)."""
    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models.tasu import forward, model_factory, trainable_mask

    def build(quant, bits=8):
        tc = TrainConfig(
            ctc_posterior=True, gt_emb=True, freeze_llm=True,
            freeze_encoder=True, quantization=quant, quant_bits=bits,
            q4_group_size=16,
        )
        mc = ModelConfig(
            llm_path="", encoder_path=None, encoder_projector="linear-silu",
            encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
        )
        m = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
        m.speech_token_id = 250
        m.use_flash = False
        return m, tc

    rng = np.random.default_rng(6)
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
    m_fp, _ = build(False)
    m_q4, tc4 = build(True, bits=4)
    node = m_q4.params["llm"]["layers"]["q_proj"]
    assert "q4" in node and node["q4"].dtype == jnp.int4
    loss_fp, _ = forward(m_fp, m_fp.params, batch, jax.random.PRNGKey(1))
    loss_q4, _ = forward(m_q4, m_q4.params, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_q4), float(loss_fp), rtol=0.08)
    mask = trainable_mask(m_q4, tc4)
    leaves = mask["llm"]["layers"]["q_proj"]
    assert leaves["q4"] is False and leaves["scale4"] is False


def test_quantization4_survives_checkpoint_import(tmp_path):
    """Checkpoint import re-quantizes fresh weights with the SAME scheme
    (bits + group size) the factory chose — q4 must not degrade to q8."""
    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models.tasu import model_factory
    from ps_slm_tpu.training.checkpoint import (
        export_reference_checkpoint, import_reference_checkpoint,
    )

    def build(quant):
        tc = TrainConfig(
            ctc_posterior=True, gt_emb=True, freeze_llm=True,
            freeze_encoder=True, quantization=quant, quant_bits=4,
            q4_group_size=16,
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
    spec_before = quant_spec(dst.params["llm"])
    assert spec_before[0] == 4
    import_reference_checkpoint(dst, path, jnp.float32)
    layers = dst.params["llm"]["layers"]
    assert quant_spec(dst.params["llm"]) == spec_before
    got = np.asarray(dequantize_kernel4(layers["q_proj"]))
    want = np.asarray(src.params["llm"]["layers"]["q_proj"]["kernel"])
    assert np.max(np.abs(got - want)) < np.max(np.abs(want)) / 4


def test_merge_lora_on_q4_base():
    from types import SimpleNamespace

    from ps_slm_tpu.models import qwen2
    from ps_slm_tpu.models.lora import add_lora, merge_lora

    cfg = qwen2.Qwen2Config.tiny()
    params = quantize_llm(
        qwen2.init_params(jax.random.PRNGKey(0), cfg), bits=4, group_size=16
    )
    peft = SimpleNamespace(r=4, lora_alpha=8, target_modules=["q_proj"])
    params = add_lora(params, peft, jax.random.PRNGKey(1))
    node = dict(params["layers"]["q_proj"])
    node["lora_b"] = jnp.full_like(node["lora_b"], 0.02)
    params["layers"]["q_proj"] = node

    merged = merge_lora(params)
    m = merged["layers"]["q_proj"]
    assert "q4" not in m and "scale4" not in m and "lora_a" not in m
    assert m["kernel"].dtype == jnp.bfloat16

    want = (
        np.asarray(dequantize_kernel4(node), np.float32)
        + np.einsum(
            "lir,lro->lio",
            np.asarray(node["lora_a"], np.float32),
            np.asarray(node["lora_b"], np.float32),
        ) * np.asarray(node["lora_scale"], np.float32)[:, None, None]
    )
    got = np.asarray(m["kernel"], np.float32)
    np.testing.assert_allclose(got, want, atol=0.01, rtol=0.01)
    assert "q4" in merged["layers"]["k_proj"]


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
