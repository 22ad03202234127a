"""LoRA adapters as additive low-rank pytree leaves.

Replaces the reference's ``peft`` usage (``ps-slm.py:114-125``,
``utils/config_utils.py:41-60``): LoRA with r=64, alpha=16, targets
q/k/v/o/up/gate/down (``aispeech_asr_config.py:41-50``).  Adapters live
*inside* the target projection's param dict as ``lora_a``/``lora_b``/
``lora_scale`` leaves; ``qwen2._linear`` applies ``y += (x@A)@B * scale``
when present.  ``lora_dropout`` (peft semantics: inverted dropout on the
adapter input, train mode only) is applied by ``qwen2.forward`` when the
training step passes an rng — see ``tasu.forward``.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_TARGET_MAP = {
    "q_proj": "q_proj",
    "k_proj": "k_proj",
    "v_proj": "v_proj",
    "o_proj": "o_proj",
    "up_proj": "up_proj",
    "gate_proj": "gate_proj",
    "down_proj": "down_proj",
}


def add_lora(llm_params: Params, peft_cfg, key, dtype=jnp.float32) -> Params:
    """Attach LoRA leaves to the stacked layer projections.

    A: kaiming-uniform [L, in, r]; B: zeros [L, r, out] (standard LoRA init,
    matching peft defaults); scale = alpha / r.
    """
    r = peft_cfg.r
    scale = peft_cfg.lora_alpha / r
    layers = dict(llm_params["layers"])
    for i, name in enumerate(sorted(set(peft_cfg.target_modules))):
        target = _TARGET_MAP.get(name)
        if target is None or target not in layers:
            continue
        node = dict(layers[target])
        # base weight may be fp ("kernel") or quantized ("q8"/"q4"); all
        # are [L, in, out]
        kernel = next(node[k] for k in ("kernel", "q8", "q4") if k in node)
        L, d_in, d_out = kernel.shape
        # peft default init: kaiming_uniform_(a=sqrt(5)) -> gain 1/sqrt(3),
        # bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in)
        bound = 1.0 / math.sqrt(d_in)
        node["lora_a"] = jax.random.uniform(
            jax.random.fold_in(key, i), (L, d_in, r), dtype, -bound, bound
        )
        node["lora_b"] = jnp.zeros((L, r, d_out), dtype)
        # per-layer scalar so the leaf scans with the stacked layer axis
        node["lora_scale"] = jnp.full((L,), scale, dtype)
        layers[target] = node
    out = dict(llm_params)
    out["layers"] = layers
    return out


def add_prefix_tuning(
    llm_params: Params, peft_cfg, llm_cfg, key, dtype=jnp.float32
) -> Params:
    """Prefix-tuning (peft_method="prefix"): a learned KV prefix.

    The reference dispatches ``peft_method="prefix"`` to peft's
    ``PrefixTuningConfig`` (``utils/config_utils.py:43-58``), which prepends
    ``num_virtual_tokens`` learned key/value vectors to every attention
    layer's KV (past_key_values mechanics — the prefix bypasses rope).  The
    TPU-native equivalent stores them as stacked-layer leaves
    ``prefix_k``/``prefix_v`` of shape [L, P, n_kv_heads, head_dim] in the
    attention node, consumed directly by ``qwen2._block`` — no
    past_key_values plumbing, one extra concat per layer.

    Init: normal with std 1/sqrt(head_dim) so the prefix starts at the same
    scale as rms-normed projected keys — near-neutral softmax contribution.
    """
    P = peft_cfg.num_virtual_tokens
    L = llm_cfg.num_hidden_layers
    nkv, hd = llm_cfg.num_key_value_heads, llm_cfg.head_dim
    std = 1.0 / math.sqrt(hd)
    layers = dict(llm_params["layers"])
    layers["prefix_k"] = (
        jax.random.normal(jax.random.fold_in(key, 0), (L, P, nkv, hd)) * std
    ).astype(dtype)
    layers["prefix_v"] = (
        jax.random.normal(jax.random.fold_in(key, 1), (L, P, nkv, hd)) * std
    ).astype(dtype)
    out = dict(llm_params)
    out["layers"] = layers
    return out


def add_llama_adapter(
    llm_params: Params, peft_cfg, llm_cfg, key, dtype=jnp.float32
) -> Params:
    """LLaMA-Adapter (peft_method="llama_adapter"): zero-init gated
    adaption prompts.

    The reference dispatches ``peft_method="llama_adapter"`` to peft's
    ``AdaptionPromptConfig`` (``utils/config_utils.py:43-58``): the top
    ``adapter_layers`` decoder layers each get ``adapter_len`` learned
    prompt vectors whose K/V are computed by the layer's OWN k/v
    projections; their attention context is added to the normal attention
    output scaled by a per-layer gate initialised to ZERO, so training
    starts exactly at the base model (the paper's zero-init attention).

    Stacked-scan layout: leaves live at the layer stack level —
    ``adaption_prompt`` [L, P, hidden] (init N(0,1), peft's ``normal_()``),
    ``adaption_gate`` [L] zeros (trainable), and a frozen 0/1
    ``adaption_mask`` [L] selecting the top ``adapter_layers`` layers
    (peft adapts ``parents[-adapter_layers:]``).  Masked layers get
    identically-zero gradients for both gate and prompt, so only the top
    layers ever train — no per-layer module surgery needed under scan.
    """
    P = peft_cfg.adapter_len
    L = llm_cfg.num_hidden_layers
    n_adapt = min(peft_cfg.adapter_layers, L)
    layers = dict(llm_params["layers"])
    layers["adaption_prompt"] = jax.random.normal(
        key, (L, P, llm_cfg.hidden_size)
    ).astype(dtype)
    layers["adaption_gate"] = jnp.zeros((L,), dtype)
    layers["adaption_mask"] = (
        jnp.arange(L) >= (L - n_adapt)
    ).astype(dtype)
    out = dict(llm_params)
    out["layers"] = layers
    return out


def merge_lora(llm_params: Params) -> Params:
    """Fold adapters into the base kernels (for export / fast inference).

    int8 (QLoRA) bases are dequantized to bf16 before folding — the merged
    kernel cannot stay q8 without a re-quantization error that would break
    merged-vs-unmerged equivalence.
    """
    def fold(node):
        if isinstance(node, dict) and "lora_a" in node:
            node = dict(node)
            delta = jnp.einsum(
                "lir,lro->lio", node["lora_a"].astype(jnp.float32),
                node["lora_b"].astype(jnp.float32),
            ) * node["lora_scale"].astype(jnp.float32)[:, None, None]
            if "kernel" in node:
                base, out_dtype = node["kernel"], node["kernel"].dtype
            elif "q8" in node:
                from ps_slm_tpu.models.quantization import dequantize_kernel

                base, out_dtype = dequantize_kernel(node), jnp.bfloat16
                node.pop("q8")
                node.pop("scale")
            else:
                from ps_slm_tpu.models.quantization import dequantize_kernel4

                base, out_dtype = dequantize_kernel4(node), jnp.bfloat16
                node.pop("q4")
                node.pop("scale4")
            node["kernel"] = (
                base.astype(jnp.float32) + delta
            ).astype(out_dtype)
            for k in ("lora_a", "lora_b", "lora_scale"):
                node.pop(k)
        return node

    layers = {k: fold(v) for k, v in llm_params["layers"].items()}
    out = dict(llm_params)
    out["layers"] = layers
    return out
