"""Qwen2 JAX implementation vs HF transformers (torch CPU) — logit parity.

The reference drives HF ``AutoModelForCausalLM`` (``ps-slm.py:89-127,530``);
here we verify our functional JAX stack is numerically equivalent on a tiny
random-initialized Qwen2, covering right-padded training batches and
left-padded generation batches, tied and untied embeddings.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ps_slm_tpu.models import qwen2

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)


def _build_pair(tie: bool):
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2ForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = Qwen2ForCausalLM(hf_cfg).eval()

    tensors = {
        k: v.detach().numpy() for k, v in hf_model.state_dict().items()
    }
    cfg = qwen2.Qwen2Config.from_hf(hf_cfg.to_dict())
    params = qwen2.hf_tensors_to_params(tensors, cfg, dtype=jnp.float32)
    return hf_model, params, cfg


def _hf_logits(hf_model, ids, mask, position_ids=None):
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=None if position_ids is None else torch.tensor(position_ids),
        )
    return out.logits.numpy()


def _jax_logits(params, cfg, ids, mask, position_ids=None):
    emb = qwen2.embed(params, jnp.asarray(ids))
    hidden, _ = qwen2.forward(
        params, cfg, emb,
        attention_mask=jnp.asarray(mask, bool),
        position_ids=None if position_ids is None else jnp.asarray(position_ids),
        use_flash=False,
    )
    return np.asarray(qwen2.unembed(params, hidden))


@pytest.mark.parametrize("tie", [False, True])
def test_logit_parity_right_padding(tie):
    hf_model, params, cfg = _build_pair(tie)
    rng = np.random.default_rng(0)
    b, s = 2, 12
    ids = rng.integers(0, 128, size=(b, s))
    mask = np.ones((b, s), np.int64)
    mask[1, -3:] = 0  # right padding

    ref = _hf_logits(hf_model, ids, mask)
    got = _jax_logits(params, cfg, ids, mask)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=2e-4)


def test_logit_parity_left_padding():
    hf_model, params, cfg = _build_pair(False)
    rng = np.random.default_rng(1)
    b, s = 2, 10
    ids = rng.integers(0, 128, size=(b, s))
    mask = np.ones((b, s), np.int64)
    mask[0, :4] = 0  # left padding
    pos = np.clip(np.cumsum(mask, axis=-1) - 1, 0, None)

    ref = _hf_logits(hf_model, ids, mask, position_ids=pos)
    got = _jax_logits(params, cfg, ids, mask, position_ids=pos)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=2e-4)


def test_kv_cache_decode_matches_full_forward():
    """Prefill + step-by-step cached decode == one full forward."""
    _, params, cfg = _build_pair(False)
    rng = np.random.default_rng(2)
    b, s_prompt, s_total, cap = 2, 5, 9, 16
    ids = rng.integers(0, 128, size=(b, s_total))
    mask_full = np.ones((b, s_total), np.int64)

    full = _jax_logits(params, cfg, ids, mask_full)

    # prefill
    cache = qwen2.init_cache(cfg, b, cap, dtype=jnp.float32)
    emb = qwen2.embed(params, jnp.asarray(ids[:, :s_prompt]))
    am = np.zeros((b, cap), bool)
    am[:, :s_prompt] = True
    hidden, cache = qwen2.forward(
        params, cfg, emb,
        attention_mask=jnp.asarray(am),
        position_ids=jnp.broadcast_to(jnp.arange(s_prompt), (b, s_prompt)),
        cache=cache, cache_index=0,
    )
    step_logits = [np.asarray(qwen2.unembed(params, hidden))[:, -1]]

    for t in range(s_prompt, s_total):
        am[:, :t + 1] = True
        emb = qwen2.embed(params, jnp.asarray(ids[:, t:t + 1]))
        hidden, cache = qwen2.forward(
            params, cfg, emb,
            attention_mask=jnp.asarray(am),
            position_ids=jnp.full((b, 1), t, jnp.int32),
            cache=cache, cache_index=t,
        )
        step_logits.append(np.asarray(qwen2.unembed(params, hidden))[:, -1])

    stepped = np.stack(step_logits, axis=1)  # [B, s_total-s_prompt+1, V]
    np.testing.assert_allclose(
        stepped, full[:, s_prompt - 1:], atol=2e-4, rtol=2e-4
    )


def test_hf_roundtrip_export():
    _, params, cfg = _build_pair(False)
    exported = qwen2.params_to_hf(params, cfg)
    params2 = qwen2.hf_tensors_to_params(exported, cfg, dtype=jnp.float32)
    import jax

    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_peft_adapter_interchange_logit_parity(tmp_path):
    """HF-PEFT adapter round trip (checkpoint.export/import_peft_adapters):
    adapters trained in the real peft library load onto our LoRA leaves and
    produce identical logits, and vice versa (reference peft_ckpt resume,
    ps-slm.py:110-113)."""
    peft = pytest.importorskip("peft")
    from types import SimpleNamespace

    import jax

    from ps_slm_tpu.config import PeftConfig
    from ps_slm_tpu.models.lora import add_lora
    from ps_slm_tpu.training.checkpoint import (
        export_peft_adapters, import_peft_adapters,
    )

    hf_model, params, cfg = _build_pair(tie=False)
    r, alpha = 4, 8
    lcfg = peft.LoraConfig(
        r=r, lora_alpha=alpha, lora_dropout=0.0, bias="none",
        target_modules=[
            "q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj",
        ],
        task_type="CAUSAL_LM",
    )
    pmodel = peft.get_peft_model(hf_model, lcfg).eval()
    # randomize lora_B (peft inits it to zero -> adapters would be no-ops)
    torch.manual_seed(7)
    with torch.no_grad():
        for name, par in pmodel.named_parameters():
            if "lora_B" in name:
                par.normal_(0, 0.2)
    pmodel.save_pretrained(str(tmp_path / "adapter"), safe_serialization=False)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), bool)
    with torch.no_grad():
        want = pmodel(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    params = add_lora(
        params, PeftConfig(r=r, lora_alpha=alpha),
        jax.random.PRNGKey(0),
    )
    model = SimpleNamespace(params={"llm": params})
    loaded = import_peft_adapters(
        model, str(tmp_path / "adapter" / "adapter_model.bin")
    )
    assert len(loaded) == 2 * 7 * cfg.num_hidden_layers
    got = _jax_logits(model.params["llm"], cfg, ids, mask)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    # reverse direction: our export loads into the peft model unchanged
    tensors = export_peft_adapters(model, str(tmp_path / "export"))
    # and is resumable via PeftModel.from_pretrained: the config written
    # next to the weights carries the r/alpha the raw A/B factors assume
    with open(tmp_path / "export" / "adapter_config.json") as f:
        acfg = json.load(f)
    assert acfg["r"] == r and acfg["lora_alpha"] == alpha
    assert acfg["peft_type"] == "LORA"
    assert sorted(acfg["target_modules"]) == sorted(lcfg.target_modules)
    sd = {k: torch.from_numpy(v) for k, v in tensors.items()}
    missing = peft.set_peft_model_state_dict(pmodel, sd)
    assert not missing.unexpected_keys
    with torch.no_grad():
        want2 = pmodel(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    np.testing.assert_allclose(got, want2, atol=2e-4, rtol=1e-4)

    # alpha mismatch: a model configured with a DIFFERENT lora_alpha still
    # reproduces the adapter's trained logits, because the import reads
    # alpha/r from adapter_config.json (raw A/B factors are scale-free)
    params_ms = add_lora(
        model.params["llm"], PeftConfig(r=r, lora_alpha=r),  # scale 1 != 2
        jax.random.PRNGKey(1),
    )
    model_ms = SimpleNamespace(params={"llm": params_ms})
    import_peft_adapters(model_ms, str(tmp_path / "adapter"))
    scale = np.asarray(
        model_ms.params["llm"]["layers"]["q_proj"]["lora_scale"]
    )
    assert np.allclose(scale, alpha / r)
    got_ms = _jax_logits(model_ms.params["llm"], cfg, ids, mask)
    np.testing.assert_allclose(got_ms, want, atol=2e-4, rtol=1e-4)


def test_prefix_tuning_cache_matches_full_forward():
    """Prefix-tuned (learned KV prefix, models/lora.py::add_prefix_tuning)
    cached decode == full forward, and the prefix changes the logits.
    Covers peft_method="prefix" on both attention paths of qwen2._block."""
    import jax

    from ps_slm_tpu.config import PeftConfig
    from ps_slm_tpu.models.lora import add_prefix_tuning

    _, params, cfg = _build_pair(False)
    base = _jax_logits(
        params, cfg, np.arange(12).reshape(2, 6) % 128,
        np.ones((2, 6), np.int64),
    )
    params = add_prefix_tuning(
        params, PeftConfig(peft_method="prefix", num_virtual_tokens=3),
        cfg, jax.random.PRNGKey(0), jnp.float32,
    )
    assert params["layers"]["prefix_k"].shape == (2, 3, 2, 8)

    rng = np.random.default_rng(4)
    b, s_prompt, s_total, cap = 2, 4, 8, 12
    ids = rng.integers(0, 128, size=(b, s_total))
    full = _jax_logits(params, cfg, ids, np.ones((b, s_total), np.int64))
    assert not np.allclose(
        full[:, :6], base[:, :], atol=1e-5
    ) or not np.array_equal(ids[:, :6], np.arange(12).reshape(2, 6) % 128)

    cache = qwen2.init_cache(cfg, b, cap, dtype=jnp.float32)
    emb = qwen2.embed(params, jnp.asarray(ids[:, :s_prompt]))
    am = np.zeros((b, cap), bool)
    am[:, :s_prompt] = True
    # explicit position_ids must carry the prefix shift themselves (the
    # default-None path adds it; HF uses cache-aware positions likewise)
    n_pre = params["layers"]["prefix_k"].shape[1]
    hidden, cache = qwen2.forward(
        params, cfg, emb,
        attention_mask=jnp.asarray(am),
        position_ids=jnp.broadcast_to(
            n_pre + jnp.arange(s_prompt), (b, s_prompt)
        ),
        cache=cache, cache_index=0,
    )
    step_logits = [np.asarray(qwen2.unembed(params, hidden))[:, -1]]
    for t in range(s_prompt, s_total):
        am[:, :t + 1] = True
        emb = qwen2.embed(params, jnp.asarray(ids[:, t:t + 1]))
        hidden, cache = qwen2.forward(
            params, cfg, emb,
            attention_mask=jnp.asarray(am),
            position_ids=jnp.full((b, 1), n_pre + t, jnp.int32),
            cache=cache, cache_index=t,
        )
        step_logits.append(np.asarray(qwen2.unembed(params, hidden))[:, -1])
    stepped = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        stepped, full[:, s_prompt - 1:], atol=2e-4, rtol=2e-4
    )

    # the prefix really participates: zero it and logits move
    z = dict(params)
    z["layers"] = dict(params["layers"])
    z["layers"]["prefix_k"] = jnp.zeros_like(params["layers"]["prefix_k"])
    z["layers"]["prefix_v"] = jnp.zeros_like(params["layers"]["prefix_v"])
    full_z = _jax_logits(z, cfg, ids, np.ones((b, s_total), np.int64))
    assert not np.allclose(full_z, full, atol=1e-5)


def test_prefix_tuning_peft_interchange_logit_parity(tmp_path):
    """Prefix-tuning adapter round trip against the REAL peft library
    (checkpoint.export/import_peft_adapters, PREFIX_TUNING layout): a peft
    PrefixTuning Qwen2's prompt_embeddings load onto our prefix_k/v leaves
    and produce identical logits, and our export loads back into peft
    unchanged.  Pins the [P, L*2, nkv, hd] view order AND the rope shift
    (real tokens rope from position P when positions are defaulted)."""
    peft = pytest.importorskip("peft")
    from types import SimpleNamespace

    import jax

    from ps_slm_tpu.config import PeftConfig
    from ps_slm_tpu.models.lora import add_prefix_tuning
    from ps_slm_tpu.training.checkpoint import (
        export_peft_adapters, import_peft_adapters,
    )

    hf_model, params, cfg = _build_pair(tie=False)
    P = 4
    pcfg = peft.PrefixTuningConfig(task_type="CAUSAL_LM", num_virtual_tokens=P)
    pmodel = peft.get_peft_model(hf_model, pcfg).eval()
    pmodel.save_pretrained(str(tmp_path / "adapter"), safe_serialization=False)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), bool)
    with torch.no_grad():
        want = pmodel(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    params = add_prefix_tuning(
        params, PeftConfig(peft_method="prefix", num_virtual_tokens=P),
        cfg, jax.random.PRNGKey(0), jnp.float32,
    )
    model = SimpleNamespace(params={"llm": params})
    loaded = import_peft_adapters(model, str(tmp_path / "adapter"))
    assert "prompt_embeddings" in loaded
    got = _jax_logits(model.params["llm"], cfg, ids, mask)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    # reverse: perturb OUR leaves, export, and load the artifact with
    # PeftModel.from_pretrained on a fresh base model — the full
    # reference-side resume path (config + weights)
    layers = model.params["llm"]["layers"]
    layers["prefix_k"] = layers["prefix_k"] * 1.5 + 0.1
    layers["prefix_v"] = layers["prefix_v"] * 0.5 - 0.2
    export_peft_adapters(model, str(tmp_path / "export"))
    with open(tmp_path / "export" / "adapter_config.json") as f:
        acfg = json.load(f)
    assert acfg["peft_type"] == "PREFIX_TUNING"
    assert acfg["num_virtual_tokens"] == P
    got2 = _jax_logits(model.params["llm"], cfg, ids, mask)

    hf_model2, _, _ = _build_pair(tie=False)
    pmodel2 = peft.PeftModel.from_pretrained(
        hf_model2, str(tmp_path / "export")
    ).eval()
    with torch.no_grad():
        want2 = pmodel2(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    np.testing.assert_allclose(got2, want2, atol=2e-4, rtol=1e-4)


def test_llama_adapter_interchange_roundtrip(tmp_path):
    """ADAPTION_PROMPT export/import round trip: peft key layout
    (base_model.model.model.layers.{i}.self_attn.adaption_{prompt,gate},
    adapted layers only) and lossless leaf recovery.  peft itself only
    wires llama/mistral/gpt2 — no stock-peft Qwen2 cross-check exists."""
    from types import SimpleNamespace

    import jax

    from ps_slm_tpu.config import PeftConfig
    from ps_slm_tpu.models.lora import add_llama_adapter
    from ps_slm_tpu.training.checkpoint import (
        export_peft_adapters, import_peft_adapters,
    )

    _, params, cfg = _build_pair(tie=False)
    pc = PeftConfig(peft_method="llama_adapter", adapter_len=3, adapter_layers=1)
    params = add_llama_adapter(params, pc, cfg, jax.random.PRNGKey(2))
    layers = params["layers"]
    L = layers["adaption_gate"].shape[0]
    layers["adaption_gate"] = jnp.arange(1, L + 1, dtype=jnp.float32)

    model = SimpleNamespace(params={"llm": params})
    tensors = export_peft_adapters(model, str(tmp_path / "export"))
    # only the top (adapted) layer is materialized, peft key layout
    assert set(tensors) == {
        f"base_model.model.model.layers.{L - 1}.self_attn.adaption_prompt",
        f"base_model.model.model.layers.{L - 1}.self_attn.adaption_gate",
    }
    assert tensors[
        f"base_model.model.model.layers.{L - 1}.self_attn.adaption_prompt"
    ].shape == (1, 3, cfg.hidden_size)
    with open(tmp_path / "export" / "adapter_config.json") as f:
        acfg = json.load(f)
    assert acfg["peft_type"] == "ADAPTION_PROMPT"
    assert acfg["adapter_len"] == 3 and acfg["adapter_layers"] == 1

    # import onto fresh leaves: adapted layer recovered exactly; the
    # non-adapted layer keeps its (inert) local init
    params2 = add_llama_adapter(
        dict(params, layers={
            k: v for k, v in layers.items()
            if not str(k).startswith("adaption_")
        }), pc, cfg, jax.random.PRNGKey(9),
    )
    model2 = SimpleNamespace(params={"llm": params2})
    loaded = import_peft_adapters(model2, str(tmp_path / "export"))
    assert len(loaded) == 2
    np.testing.assert_array_equal(
        np.asarray(model2.params["llm"]["layers"]["adaption_prompt"][-1]),
        np.asarray(layers["adaption_prompt"][-1]),
    )
    assert float(model2.params["llm"]["layers"]["adaption_gate"][-1]) == float(L)


def test_llama_adapter_noop_import_keeps_dtype(tmp_path):
    """Importing an adapter file with NO adaption keys (e.g. LoRA-only) onto
    an adapter-equipped model must not touch adaption_prompt/adaption_gate —
    previously the branch re-cast them to the import dtype as a side effect."""
    from types import SimpleNamespace

    import jax

    from ps_slm_tpu.config import PeftConfig
    from ps_slm_tpu.models.lora import add_llama_adapter
    from ps_slm_tpu.training.checkpoint import import_peft_adapters

    _, params, cfg = _build_pair(tie=False)
    pc = PeftConfig(peft_method="llama_adapter", adapter_len=3, adapter_layers=1)
    params = add_llama_adapter(params, pc, cfg, jax.random.PRNGKey(2))
    layers = params["layers"]
    before_p = np.asarray(layers["adaption_prompt"]).copy()
    assert layers["adaption_prompt"].dtype == jnp.float32

    model = SimpleNamespace(params={"llm": params})
    loaded = import_peft_adapters(model, {}, dtype=jnp.bfloat16)
    assert loaded == []
    got = model.params["llm"]["layers"]["adaption_prompt"]
    assert got.dtype == jnp.float32  # untouched, not coerced to bf16
    np.testing.assert_array_equal(np.asarray(got), before_p)
