"""End-to-end TASU composite model: every §2.B branch + the text-only
training slice (SURVEY.md §7 step 5 — the ONE-model milestone)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.config import ModelConfig, TrainConfig
from ps_slm_tpu.models import tasu
from ps_slm_tpu.models.tasu import TasuModel, forward, model_factory, trainable_mask
from ps_slm_tpu.training.train_state import (
    apply_gradients, build_optimizer, create_train_state,
)

SPEECH = 250
PAD = 0

ENC_VOCAB = 11   # SenseVoiceConfig.tiny().vocab_size
ENC_DIM = 16     # SenseVoiceConfig.tiny().output_size
ENC_INPUT = 24   # SenseVoiceConfig.tiny().input_size
LLM_VOCAB = 256  # Qwen2Config.tiny().vocab_size
LLM_DIM = 64     # Qwen2Config.tiny().hidden_size


def _mk_model(projector="linear-silu", encoder_dim=ENC_VOCAB, llm_dim=LLM_DIM,
              ds_rate=1, **train_kw):
    tc = TrainConfig(**train_kw)
    mc = ModelConfig(
        llm_path="", encoder_path=None,
        encoder_projector=projector,
        encoder_dim=encoder_dim, llm_dim=llm_dim,
        encoder_projector_ds_rate=ds_rate,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    model.speech_token_id = SPEECH
    model.pad_token_id = PAD
    model.use_flash = False
    return model, tc


def _mk_batch(rng, b=2, s=10, a=8, with_audio=True, with_gt=True):
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 3] = SPEECH
    mask = np.ones((b, s), bool)
    mask[1, -2:] = False
    ids[1, -2:] = PAD
    labels = ids.astype(np.int32).copy()
    labels[:, :5] = -100           # prompt masked
    labels[~mask] = -100
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
    }
    if with_audio:
        batch["input_features"] = jnp.asarray(
            rng.normal(size=(b, a, ENC_INPUT)).astype(np.float32)
        )
        batch["input_feature_length"] = jnp.asarray([a, a - 3])
    if with_gt:
        gt = rng.integers(1, ENC_VOCAB, size=(b, 6)).astype(np.int32)
        batch["gt_ids"] = jnp.asarray(gt)
        batch["gt_lens"] = jnp.asarray([6, 4])
    return batch


def _check(model, batch):
    loss, metrics = forward(
        model, model.params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss)), float(loss)
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    return float(loss)


def test_text_only_tasu():
    model, _ = _mk_model(ctc_posterior=True, gt_emb=True)
    _check(model, _mk_batch(np.random.default_rng(0), with_audio=False))


def test_text_only_tasu_noise():
    model, _ = _mk_model(ctc_posterior=True, gt_emb=True, gt_emb_noise=True)
    _check(model, _mk_batch(np.random.default_rng(1), with_audio=False))


@pytest.mark.slow
def test_text_only_tasu_insertion_noise():
    """insert_prob is honored end-to-end (ps-slm.py:388-399), not ignored."""
    model, _ = _mk_model(
        ctc_posterior=True, gt_emb=True, gt_emb_noise=True, insert_prob=0.3,
    )
    assert model.flags.insert_prob == 0.3
    _check(model, _mk_batch(np.random.default_rng(1), with_audio=False))


@pytest.mark.parametrize("do_psd", [False, True])
def test_audio_tasu(do_psd):
    model, _ = _mk_model(ctc_posterior=True, do_psd=do_psd)
    _check(model, _mk_batch(np.random.default_rng(2), with_gt=False))


def test_cross_attention():
    model, _ = _mk_model(
        projector="cross-attention", ctc_posterior=True, cross_attn=True
    )
    _check(model, _mk_batch(np.random.default_rng(3), with_gt=False))


@pytest.mark.parametrize("do_psd,top1", [(False, False), (True, False), (True, True)])
def test_voca_trans(do_psd, top1):
    model, _ = _mk_model(
        projector="simple_linear", encoder_dim=ENC_DIM, llm_dim=LLM_VOCAB,
        ds_rate=2, ctc_posterior=True, voca_trans=True, do_psd=do_psd,
        top1_emb=top1, voca_trans_blank_id=LLM_VOCAB - 1,
    )
    _check(model, _mk_batch(np.random.default_rng(4), with_gt=False))


@pytest.mark.parametrize("do_psd", [False, True])
def test_raw_feature_baseline(do_psd):
    model, _ = _mk_model(
        projector="linear", encoder_dim=ENC_DIM, ds_rate=2, do_psd=do_psd
    )
    _check(model, _mk_batch(np.random.default_rng(5), with_gt=False))


def test_lora_flags():
    model, tc = _mk_model(
        ctc_posterior=True, gt_emb=True, use_peft=True, freeze_llm=True,
        freeze_encoder=True,
    )
    # LoRA leaves exist and forward still works
    assert "lora_a" in model.params["llm"]["layers"]["q_proj"]
    _check(model, _mk_batch(np.random.default_rng(6), with_audio=False))
    mask = trainable_mask(model, tc)
    assert mask["llm"]["layers"]["q_proj"]["lora_a"] is True
    assert mask["llm"]["layers"]["q_proj"]["kernel"] is False
    assert all(jax.tree_util.tree_leaves(mask["projector"]))


@pytest.mark.slow
def test_lora_dropout_active_in_training():
    """lora_dropout is honored (peft semantics), not silently carried."""
    model, tc = _mk_model(
        ctc_posterior=True, gt_emb=True, use_peft=True, freeze_llm=True,
        freeze_encoder=True,
    )
    assert model.lora_dropout == tc.peft_config.lora_dropout > 0.0
    batch = _mk_batch(np.random.default_rng(7), with_audio=False)
    # lora_b init is zero, so dropout on the adapter input is invisible in
    # the loss; make the adapter non-trivial first
    import jax.tree_util as jtu

    def bump(path, leaf):
        if any(str(getattr(p, "key", "")) == "lora_b" for p in path):
            return jnp.ones_like(leaf) * 0.05
        return leaf

    model.params["llm"] = jtu.tree_map_with_path(bump, model.params["llm"])
    l1 = _check(model, batch)
    loss2, _ = forward(model, model.params, batch, jax.random.PRNGKey(2))
    assert l1 != float(loss2)  # different dropout masks -> different loss
    # eval path (no rng): deterministic, dropout off
    le1, _ = forward(model, model.params, batch, None)
    le2, _ = forward(model, model.params, batch, None)
    assert float(le1) == float(le2)


def test_text_only_training_loss_decreases():
    """The §7.5 milestone: GT text -> pseudo-posterior -> projector -> frozen
    tiny LLM -> merge -> CE; AdamW on projector only; loss must drop."""
    model, tc = _mk_model(
        ctc_posterior=True, gt_emb=True, gt_emb_noise=True,
        freeze_llm=True, freeze_encoder=True,
        lr=5e-3, warmup_steps=2, total_steps=50,
    )
    batch = _mk_batch(np.random.default_rng(7), with_audio=False)
    from ps_slm_tpu.training.step import make_train_step

    # snapshot originals before the donating train step invalidates them
    emb0 = np.asarray(model.params["llm"]["embed_tokens"]).copy()
    proj0 = np.asarray(model.params["projector"]["ffn1"]["kernel"]).copy()

    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)
    step = make_train_step(model, tx, trainable)

    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses
    # frozen modules unchanged
    np.testing.assert_array_equal(
        np.asarray(state.params["llm"]["embed_tokens"]), emb0
    )
    # projector actually moved
    assert not np.allclose(
        np.asarray(state.params["projector"]["ffn1"]["kernel"]), proj0
    )


def test_projector_params_jit_trainable():
    """Head counts are static config, never param leaves (regression: an
    int32 'n_heads' leaf became a tracer under jit and broke the reshape;
    value_and_grad also rejected it when the projector was trainable).
    The jitted train step must run with a trainable cross-attention
    projector, and no projector may carry non-float leaves."""
    from ps_slm_tpu.training.step import make_train_step
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )

    model, tc = _mk_model(
        projector="cross-attention", ctc_posterior=True, cross_attn=True,
        freeze_llm=True, freeze_encoder=True,
        lr=1e-3, warmup_steps=1, total_steps=10,
    )
    assert "n_heads" not in model.params["projector"]
    mask = trainable_mask(model, tc)
    assert mask["projector"]["w_q"]["kernel"] is True

    tx, _ = build_optimizer(tc)
    state = create_train_state(model.params, tx, mask)
    step = make_train_step(model, tx, trainable=mask)
    batch = _mk_batch(np.random.default_rng(8), with_gt=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # every projector in the zoo: float-array leaves only
    from ps_slm_tpu.config import ModelConfig
    from ps_slm_tpu.models import projector as proj

    for name in ("simple_linear", "linear", "cov1d-linear", "linear-silu",
                  "cross-attention", "q-former"):
        cfg = ModelConfig(
            encoder_projector=name, encoder_dim=24, llm_dim=36,
            encoder_projector_ds_rate=2, qformer_layers=2, qformer_heads=4,
            query_len=4,
        )
        p = proj.init_projector(jax.random.PRNGKey(0), cfg)
        for leaf in jax.tree_util.tree_leaves(p):
            assert hasattr(leaf, "dtype") and jnp.issubdtype(
                leaf.dtype, jnp.floating
            ), (name, leaf)


def test_eval_mode_disables_stochastic_paths():
    """train=False = torch model.eval(): LoRA dropout (and dither /
    SpecAugment) off — eval loss is rng-independent; the training path
    with the same params is not (regression: eval ran with dropout)."""
    import jax.tree_util as jtu

    model, tc = _mk_model(
        ctc_posterior=True, gt_emb=True, use_peft=True, freeze_llm=True,
        freeze_encoder=True,
    )
    assert model.lora_dropout > 0.0
    batch = _mk_batch(np.random.default_rng(9), with_audio=False)

    def bump(path, leaf):
        if any(str(getattr(p, "key", "")) == "lora_b" for p in path):
            return jnp.ones_like(leaf) * 0.05
        return leaf

    model.params["llm"] = jtu.tree_map_with_path(bump, model.params["llm"])

    lt1, _ = forward(model, model.params, batch, jax.random.PRNGKey(1))
    lt2, _ = forward(model, model.params, batch, jax.random.PRNGKey(2))
    assert float(lt1) != float(lt2)  # train mode: dropout active

    le1, _ = forward(model, model.params, batch, jax.random.PRNGKey(1),
                     train=False)
    le2, _ = forward(model, model.params, batch, jax.random.PRNGKey(2),
                     train=False)
    assert float(le1) == float(le2)  # eval mode: rng-independent

    # the jitted eval step agrees with the dropout-free forward
    from ps_slm_tpu.training.step import make_eval_step

    ev = make_eval_step(model)(model.params, batch)
    np.testing.assert_allclose(float(ev["loss"]), float(le1), rtol=1e-6)


def test_prefix_tuning_flags():
    """peft_method="prefix" (reference dispatch utils/config_utils.py:43-58
    -> peft.PrefixTuningConfig): learned KV prefix leaves exist, train under
    the PEFT mask, and change the forward."""
    from ps_slm_tpu.config import PeftConfig

    model, tc = _mk_model(
        ctc_posterior=True, gt_emb=True, use_peft=True, freeze_llm=True,
        freeze_encoder=True,
        peft_config=PeftConfig(peft_method="prefix", num_virtual_tokens=4),
    )
    layers = model.params["llm"]["layers"]
    assert layers["prefix_k"].shape[1] == 4
    assert "lora_a" not in layers["q_proj"]
    batch = _mk_batch(np.random.default_rng(8), with_audio=False)
    l_pre = _check(model, batch)

    mask = trainable_mask(model, tc)
    assert mask["llm"]["layers"]["prefix_k"] is True
    assert mask["llm"]["layers"]["prefix_v"] is True
    assert mask["llm"]["layers"]["q_proj"]["kernel"] is False

    # zeroing the prefix changes the loss -> the prefix is really attended
    model.params["llm"]["layers"]["prefix_k"] = jnp.zeros_like(layers["prefix_k"])
    model.params["llm"]["layers"]["prefix_v"] = jnp.zeros_like(layers["prefix_v"])
    l_zero = _check(model, batch)
    assert l_pre != l_zero


def test_llama_adapter_flags():
    """peft_method="llama_adapter" (reference dispatch
    utils/config_utils.py:43-58 -> peft.AdaptionPromptConfig): zero-init
    gated adaption prompts on the top adapter_layers layers."""
    from ps_slm_tpu.config import PeftConfig

    model, tc = _mk_model(
        ctc_posterior=True, gt_emb=True, use_peft=True, freeze_llm=True,
        freeze_encoder=True,
        peft_config=PeftConfig(
            peft_method="llama_adapter", adapter_len=4, adapter_layers=1,
        ),
    )
    layers = model.params["llm"]["layers"]
    L = layers["adaption_gate"].shape[0]
    assert layers["adaption_prompt"].shape[:2] == (L, 4)
    # top-1 layer adapted: mask = [0, ..., 0, 1]
    np.testing.assert_array_equal(
        np.asarray(layers["adaption_mask"]),
        np.asarray([0.0] * (L - 1) + [1.0], np.float32),
    )
    assert "lora_a" not in layers["q_proj"]

    mask = trainable_mask(model, tc)
    assert mask["llm"]["layers"]["adaption_prompt"] is True
    assert mask["llm"]["layers"]["adaption_gate"] is True
    assert mask["llm"]["layers"]["adaption_mask"] is False  # frozen buffer
    assert mask["llm"]["layers"]["q_proj"]["kernel"] is False

    # zero-init gate: forward at init is EXACTLY the base model
    batch = _mk_batch(np.random.default_rng(8), with_audio=False)
    base, _ = _mk_model(
        ctc_posterior=True, gt_emb=True, freeze_llm=True,
        freeze_encoder=True,
    )
    l_init = _check(model, batch)
    np.testing.assert_allclose(l_init, _check(base, batch), rtol=1e-6)

    # opening the gate on the adapted layer changes the loss -> the prompt
    # is really attended; gradients reach prompt+gate only on that layer
    model.params["llm"]["layers"]["adaption_gate"] = (
        jnp.full((L,), 0.5, layers["adaption_gate"].dtype)
    )
    l_open = _check(model, batch)
    assert l_open != l_init

    def loss_fn(g, p):
        params = jax.tree_util.tree_map(lambda x: x, model.params)
        lay = dict(params["llm"]["layers"])
        lay["adaption_gate"], lay["adaption_prompt"] = g, p
        params["llm"] = dict(params["llm"], layers=lay)
        loss, _ = forward(model, params, batch, jax.random.PRNGKey(1))
        return loss

    gg, gp = jax.grad(loss_fn, argnums=(0, 1))(
        model.params["llm"]["layers"]["adaption_gate"],
        model.params["llm"]["layers"]["adaption_prompt"],
    )
    gg, gp = np.asarray(gg), np.asarray(gp)
    assert np.all(gg[:-1] == 0) and gg[-1] != 0
    assert np.all(gp[:-1] == 0) and np.any(gp[-1] != 0)
