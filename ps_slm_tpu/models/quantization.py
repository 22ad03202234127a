"""Int8 / int4 weight-only quantization for the LLM.

Parity for the reference's ``load_in_8bit`` path (``ps-slm.py:92-103``,
bitsandbytes) re-designed for TPU: per-output-channel symmetric int8 on the
transformer projection kernels.  At matmul time the int8 block streams from
HBM and the scale is applied to the *output*:

    y = (x @ W_q8.astype(bf16)) * scale          # W[i,o] = q8[i,o]*scale[o]

so no dequantized weight tensor is ever materialized — XLA fuses the
int8->bf16 convert into the matmul operand read.  Halves LLM HBM traffic,
which is the bound for small-batch decode.

Int4 (beyond the reference, which only has 8-bit): native XLA ``s4``
storage (two nibbles per HBM byte — 4x less weight traffic than bf16)
with GPTQ/AWQ-style *group-wise* symmetric scales along the contraction
axis (default group 128), because one scale per output channel is too
coarse at 4 bits.  The matmul becomes a per-group batched matmul with
f32 accumulation:

    y = sum_g (x[..., g, :] @ W_q4[g].astype(bf16)) * scale[g, o]

which keeps a 128-deep contraction per group — exactly one pass through
the MXU systolic array — so the grouping costs no MXU efficiency.

QLoRA composition: LoRA leaves coexist with q8/q4 kernels (qwen2._linear
adds the adapter delta after the quantized base matmul).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

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


def _group_size(in_features: int, group_size: int) -> int:
    """Effective contraction-group size: the requested size when it divides
    the in-features, else one full-depth group (tiny test models)."""
    if group_size > 0 and in_features % group_size == 0:
        return group_size
    return in_features


_S4_SUPPORTED = None


def _q4_container_dtype():
    """Storage dtype for the 4-bit codes.  Feature-probed once: the axon
    TPU relay backend (which still reports platform "tpu") cannot move s4
    arrays across jit boundaries (device_put recursion in dispatch); there
    the ±7 codes live in an int8 container — bit-identical numerics, the
    s4 HBM saving deferred to real pods."""
    global _S4_SUPPORTED
    if _S4_SUPPORTED is None:
        import jax

        try:
            x = jax.jit(lambda: jnp.zeros((8, 8), jnp.int4))()
            np.asarray(jax.jit(lambda a: a.astype(jnp.int8))(x))
            _S4_SUPPORTED = True
        except Exception:  # noqa: BLE001 — any failure means "don't use s4"
            _S4_SUPPORTED = False
    return jnp.int4 if _S4_SUPPORTED else jnp.int8


def quantize_kernel4(
    kernel: jnp.ndarray, group_size: int = 128
) -> Dict[str, jnp.ndarray]:
    """[..., in, out] fp -> {"q4": int4[..., in, out],
    "scale4": f32[..., in/gs, out]} — symmetric group-wise int4 (±7; the
    -8 code is unused so the grid stays symmetric around 0)."""
    w = kernel.astype(jnp.float32)
    lead, (i, o) = w.shape[:-2], w.shape[-2:]
    gs = _group_size(i, group_size)
    wg = w.reshape(*lead, i // gs, gs, o)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(_q4_container_dtype())
    return {"q4": q.reshape(*lead, i, o), "scale4": scale.squeeze(-2)}


def dequantize_kernel4(node: Dict[str, jnp.ndarray], dtype=jnp.float32):
    q4, scale = node["q4"], node["scale4"]
    lead, (i, o) = q4.shape[:-2], q4.shape[-2:]
    gs = i // scale.shape[-2]
    w = q4.astype(jnp.float32).reshape(*lead, i // gs, gs, o)
    w = w * scale[..., :, None, :]
    return w.reshape(*lead, i, o).astype(dtype)


def q4_matmul(x: jnp.ndarray, node: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Group-wise int4 matmul: per-group bf16 batched matmul (one MXU pass
    per 128-deep group), then the f32 scale contraction over groups.

    ``node["q4"]`` must be the layer-sliced 2-D [in, out] block (this is
    what ``qwen2._linear`` sees inside the layer scan)."""
    q4, scale = node["q4"], node["scale4"]
    i, o = q4.shape[-2], q4.shape[-1]
    g = scale.shape[-2]
    w = q4.astype(x.dtype).reshape(g, i // g, o)
    xg = x.reshape(*x.shape[:-1], g, i // g)
    part = jnp.einsum("...gi,gio->...go", xg, w)
    y = jnp.einsum(
        "...go,go->...o", part.astype(jnp.float32),
        scale.astype(jnp.float32),
    )
    return y.astype(x.dtype)


def quantize_llm(
    llm_params: Params, bits: int = 8, group_size: int = 128
) -> Params:
    """Quantize the projection kernels in the stacked layer pytree."""
    if bits not in (4, 8):
        raise ValueError(f"quant_bits must be 4 or 8, got {bits}")
    layers = dict(llm_params["layers"])
    for name in _QUANT_TARGETS:
        if name not in layers:
            continue
        node = dict(layers[name])
        if "kernel" not in node:
            continue
        if bits == 8:
            node.update(quantize_kernel(node.pop("kernel")))
        else:
            node.update(quantize_kernel4(node.pop("kernel"), group_size))
        layers[name] = node
    out = dict(llm_params)
    out["layers"] = layers
    return out


def dequantize_llm(llm_params: Params, dtype=jnp.bfloat16) -> Params:
    """Inverse (checkpoint export); handles q8 and q4 nodes."""
    layers = dict(llm_params["layers"])
    for name, node in list(layers.items()):
        if isinstance(node, dict) and "q8" in node:
            node = dict(node)
            node["kernel"] = dequantize_kernel(node, dtype)
            node.pop("q8")
            node.pop("scale")
            layers[name] = node
        elif isinstance(node, dict) and "q4" in node:
            node = dict(node)
            node["kernel"] = dequantize_kernel4(node, dtype)
            node.pop("q4")
            node.pop("scale4")
            layers[name] = node
    out = dict(llm_params)
    out["layers"] = layers
    return out


def quantize_kv(x: jnp.ndarray):
    """Per-vector symmetric int8 for KV-cache entries: one f32 scale per
    [..., head_dim] vector (amax/127 over the last axis).

    Decode is KV-HBM-bound at long context — int8 cells halve cache
    traffic and double slot capacity; the convert+scale on read fuses into
    the attention matmuls (models/qwen2.py ``_block``)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(xf / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    return (q.astype(dtype) * scale[..., None].astype(dtype))


def quant_spec(llm_params: Params):
    """(bits, group_size) of a quantized LLM pytree, or None if fp.

    Used by checkpoint import to re-quantize fresh weights with the same
    scheme the factory chose (training/checkpoint.py)."""
    for node in llm_params["layers"].values():
        if isinstance(node, dict) and "q8" in node:
            return 8, 0
        if isinstance(node, dict) and "q4" in node:
            i = node["q4"].shape[-2]
            return 4, i // node["scale4"].shape[-2]
    return None
