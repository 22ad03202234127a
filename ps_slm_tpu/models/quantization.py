"""Int8 weight-only quantization for the LLM.

Parity for the reference's ``load_in_8bit`` path (``ps-slm.py:92-103``,
bitsandbytes) re-designed for TPU: per-output-channel symmetric int8 on the
transformer projection kernels.  At matmul time the int8 block streams from
HBM and the scale is applied to the *output*:

    y = (x @ W_q8.astype(bf16)) * scale          # W[i,o] = q8[i,o]*scale[o]

so no dequantized weight tensor is ever materialized — XLA fuses the
int8->bf16 convert into the matmul operand read.  Halves LLM HBM traffic,
which is the bound for small-batch decode.

QLoRA composition: LoRA leaves coexist with q8 kernels (qwen2._linear adds
the adapter delta after the quantized base matmul).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

Params = Dict[str, Any]

_QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj",
)


def quantize_kernel(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., in, out] fp -> {"q8": int8, "scale": f32[..., out]}."""
    w = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)       # per out channel
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale.squeeze(-2)}


def dequantize_kernel(node: Dict[str, jnp.ndarray], dtype=jnp.float32):
    return (
        node["q8"].astype(jnp.float32) * node["scale"][..., None, :]
    ).astype(dtype)


def q8_matmul(x: jnp.ndarray, node: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """y = (x @ q8) * scale, computed in x.dtype — THE quantized-matmul
    recipe; ``qwen2._linear`` calls this (single source of truth)."""
    y = x @ node["q8"].astype(x.dtype)
    return y * node["scale"].astype(x.dtype)


def quantize_llm(llm_params: Params) -> Params:
    """Quantize the projection kernels in the stacked layer pytree."""
    layers = dict(llm_params["layers"])
    for name in _QUANT_TARGETS:
        if name not in layers:
            continue
        node = dict(layers[name])
        if "kernel" not in node:
            continue
        node.update(quantize_kernel(node.pop("kernel")))
        layers[name] = node
    out = dict(llm_params)
    out["layers"] = layers
    return out


def dequantize_llm(llm_params: Params, dtype=jnp.bfloat16) -> Params:
    """Inverse (checkpoint export)."""
    layers = dict(llm_params["layers"])
    for name, node in list(layers.items()):
        if isinstance(node, dict) and "q8" in node:
            node = dict(node)
            node["kernel"] = dequantize_kernel(node, dtype)
            node.pop("q8")
            node.pop("scale")
            layers[name] = node
    out = dict(llm_params)
    out["layers"] = layers
    return out
