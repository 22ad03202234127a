"""SenseVoiceSmall encoder (SANM attention + FSMN memory + CTC head) in JAX.

Re-design of the vendored FunASR encoder in ``Multitask/model/SenseVoice.py``:

  SinusoidalPositionEncoder      SenseVoice.py:20-50
  PositionwiseFeedForward        SenseVoice.py:53-73
  MultiHeadedAttentionSANM       SenseVoice.py:76-267 (self-attn + depthwise
                                 FSMN conv branch over V, kernel 11)
  fp32 LayerNorm                 SenseVoice.py:270-282
  EncoderLayerSANM               SenseVoice.py:296-436 (pre-norm; residual
                                 only when in_size == size)
  SenseVoiceEncoderSmall         SenseVoice.py:439-579 (encoders0[1] +
                                 encoders[num_blocks-1] + tp_encoders
                                 ["tp" = timestamp-predictor] + after/tp norm)
  CTC head (ctc_lo)              funasr CTC; used at ps-slm.py:450
  query-token embedding table    SenseVoice.py:640 (16 x input_size)

Stacked-layer pytrees + ``lax.scan`` for the homogeneous blocks; attention
dispatches to the Pallas flash kernel on TPU (padding expressed as prefix
lengths).  All LayerNorms run in fp32 per the reference policy.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ps_slm_tpu.models.layers import layer_norm, linear, linear_init, ln_init
from ps_slm_tpu.ops.attention import attention

Params = Dict[str, Any]


@dataclass(frozen=True)
class SenseVoiceConfig:
    input_size: int = 560          # 80 mel x LFR 7 (ps-slm.py:426)
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50           # SenseVoiceSmall checkpoint depth
    tp_blocks: int = 20            # timestamp-predictor blocks (NOT tensor parallel)
    kernel_size: int = 11
    sanm_shift: int = 0
    vocab_size: int = 25055
    blank_id: int = 0
    n_query_embed: int = 16        # 7 + 7 lid + 2 textnorm (SenseVoice.py:640)

    @staticmethod
    def tiny(**kw) -> "SenseVoiceConfig":
        base = dict(
            input_size=24, output_size=16, attention_heads=2,
            linear_units=32, num_blocks=3, tp_blocks=2, kernel_size=5,
            vocab_size=11,
        )
        base.update(kw)
        return SenseVoiceConfig(**base)


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------

def _init_layer(key, in_size: int, size: int, cfg: SenseVoiceConfig, dtype):
    ks = jax.random.split(key, 5)
    h = cfg.attention_heads
    bound = 1.0 / math.sqrt(size)
    return {
        "norm1": ln_init(in_size, dtype),
        "norm2": ln_init(size, dtype),
        "qkv": linear_init(ks[0], in_size, size * 3, dtype),
        "out": linear_init(ks[1], size, size, dtype),
        "fsmn": {  # depthwise conv kernel [k, 1, size], no bias
            "kernel": jax.random.uniform(
                ks[2], (cfg.kernel_size, 1, size), dtype, -bound, bound
            )
        },
        "w1": linear_init(ks[3], size, cfg.linear_units, dtype),
        "w2": linear_init(ks[4], cfg.linear_units, size, dtype),
    }


def _stack_layers(key, n: int, size: int, cfg: SenseVoiceConfig, dtype):
    keys = jax.random.split(key, max(n, 1))
    layers = [_init_layer(keys[i], size, size, cfg, dtype) for i in range(n)]
    if not layers:
        return None
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def init_params(key, cfg: SenseVoiceConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    d = cfg.output_size
    params: Params = {
        "encoders0": _init_layer(ks[0], cfg.input_size, d, cfg, dtype),
        "encoders": _stack_layers(ks[1], cfg.num_blocks - 1, d, cfg, dtype),
        "tp_encoders": _stack_layers(ks[2], cfg.tp_blocks, d, cfg, dtype),
        "after_norm": ln_init(d, dtype),
        "tp_norm": ln_init(d, dtype),
        "ctc_lo": linear_init(ks[3], d, cfg.vocab_size, dtype),
        "query_embed": jax.random.normal(
            ks[4], (cfg.n_query_embed, cfg.input_size)
        ).astype(dtype),
    }
    return params


# ----------------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------------

def sinusoidal_pe(t: int, depth: int, dtype=jnp.float32) -> jnp.ndarray:
    """SinusoidalPositionEncoder.encode (SenseVoice.py:26-43): positions are
    1-based; timescale increment log(10000)/(depth/2 - 1)."""
    positions = jnp.arange(1, t + 1, dtype=jnp.float32)
    inc = math.log(10000.0) / (depth / 2 - 1)
    inv = jnp.exp(jnp.arange(depth // 2, dtype=jnp.float32) * -inc)
    scaled = positions[:, None] * inv[None, :]
    return jnp.concatenate(
        [jnp.sin(scaled), jnp.cos(scaled)], axis=-1
    ).astype(dtype)


def _fsmn_block(v, kernel, mask):
    """Depthwise FSMN memory branch (SenseVoice.py:124-140): mask, pad
    (k-1)//2 each side, depthwise conv, inner residual, mask again."""
    if mask is not None:
        v = v * mask[..., None]
    k = kernel.shape[0]
    left = (k - 1) // 2
    right = k - 1 - left
    x = jnp.pad(v, ((0, 0), (left, right), (0, 0)))
    size = v.shape[-1]
    x = jax.lax.conv_general_dilated(
        x, kernel.astype(v.dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=size,
    )
    x = x + v
    if mask is not None:
        x = x * mask[..., None]
    return x


def _sanm_layer(
    lp: Params, x: jnp.ndarray, lens: jnp.ndarray, cfg: SenseVoiceConfig,
    in_size: int, use_flash: Optional[bool],
) -> jnp.ndarray:
    """EncoderLayerSANM (SenseVoice.py:324-400), pre-norm convention."""
    b, t, _ = x.shape
    d = cfg.output_size
    h = cfg.attention_heads
    hd = d // h
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, t), 1) < lens[:, None]
    )

    residual = x
    y = layer_norm(x, lp["norm1"]["weight"], lp["norm1"]["bias"])
    qkv = linear(y, lp["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fsmn = _fsmn_block(v, lp["fsmn"]["kernel"], mask.astype(v.dtype))
    att = attention(
        q.reshape(b, t, h, hd), k.reshape(b, t, h, hd), v.reshape(b, t, h, hd),
        kv_mask=mask, causal=False, use_flash=use_flash,
    ).reshape(b, t, d)
    att = linear(att, lp["out"]) + fsmn
    x = att if in_size != d else residual + att

    residual = x
    y = layer_norm(x, lp["norm2"]["weight"], lp["norm2"]["bias"])
    y = linear(jax.nn.relu(linear(y, lp["w1"])), lp["w2"])
    return residual + y


def encode(
    params: Params,
    cfg: SenseVoiceConfig,
    xs: jnp.ndarray,        # [B, T, input_size] (queries already prepended)
    lens: jnp.ndarray,      # [B]
    *,
    use_flash: Optional[bool] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SenseVoiceEncoderSmall.forward (SenseVoice.py:548-579).

    Returns (hidden [B,T,output_size], out_lens [B]).
    """
    xs = xs * (cfg.output_size ** 0.5)
    pe = sinusoidal_pe(xs.shape[1], cfg.input_size, jnp.float32)
    xs = (xs.astype(jnp.float32) + pe[None]).astype(xs.dtype)

    xs = _sanm_layer(
        params["encoders0"], xs, lens, cfg, cfg.input_size, use_flash
    )

    def body(x, lp):
        return (
            _sanm_layer(lp, x, lens, cfg, cfg.output_size, use_flash),
            None,
        )

    if remat:
        body = jax.checkpoint(body)

    if params["encoders"] is not None:
        xs, _ = jax.lax.scan(body, xs, params["encoders"])
    xs = layer_norm(
        xs, params["after_norm"]["weight"], params["after_norm"]["bias"]
    )
    if params["tp_encoders"] is not None:
        xs, _ = jax.lax.scan(body, xs, params["tp_encoders"])
    xs = layer_norm(xs, params["tp_norm"]["weight"], params["tp_norm"]["bias"])
    return xs, lens


def ctc_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """CTC projection (funasr ``ctc.ctc_lo``, used at ps-slm.py:450)."""
    return linear(hidden, params["ctc_lo"])


def query_embedding(params: Params, ids) -> jnp.ndarray:
    """Query-token embeddings (language/event/emotion/textnorm),
    SenseVoice.py:640 + ps-slm.py:430-443."""
    return params["query_embed"][jnp.asarray(ids)]


# ----------------------------------------------------------------------------
# FunASR checkpoint import (model.pt state dict, numpy tensors)
# ----------------------------------------------------------------------------

def funasr_tensors_to_params(
    tensors: Dict[str, np.ndarray], cfg: SenseVoiceConfig, dtype=jnp.float32,
    consumed: "set | None" = None,
) -> Params:
    """Map a FunASR SenseVoiceSmall state dict onto the pytree.

    Key layout (SenseVoice.py:503-543, 619, 640):
      encoder.encoders0.0.*, encoder.encoders.N.*, encoder.tp_encoders.N.*,
      encoder.after_norm.*, encoder.tp_norm.*, ctc.ctc_lo.*, embed.weight

    ``consumed`` (if given) collects the tensor-dict keys actually read, so
    callers can report unrecognized keys as unmatched instead of loaded.
    """
    def get(name):
        for cand in (name, name.replace("encoder.", "", 1)):
            if cand in tensors:
                if consumed is not None:
                    consumed.add(cand)
                return np.asarray(tensors[cand])
        raise KeyError(name)

    def layer_from(prefix):
        return {
            "norm1": {
                "weight": jnp.asarray(get(f"{prefix}.norm1.weight"), dtype),
                "bias": jnp.asarray(get(f"{prefix}.norm1.bias"), dtype),
            },
            "norm2": {
                "weight": jnp.asarray(get(f"{prefix}.norm2.weight"), dtype),
                "bias": jnp.asarray(get(f"{prefix}.norm2.bias"), dtype),
            },
            "qkv": {
                "kernel": jnp.asarray(
                    get(f"{prefix}.self_attn.linear_q_k_v.weight").T, dtype
                ),
                "bias": jnp.asarray(
                    get(f"{prefix}.self_attn.linear_q_k_v.bias"), dtype
                ),
            },
            "out": {
                "kernel": jnp.asarray(
                    get(f"{prefix}.self_attn.linear_out.weight").T, dtype
                ),
                "bias": jnp.asarray(
                    get(f"{prefix}.self_attn.linear_out.bias"), dtype
                ),
            },
            # torch depthwise Conv1d weight [C,1,k] -> [k,1,C]
            "fsmn": {
                "kernel": jnp.asarray(
                    get(f"{prefix}.self_attn.fsmn_block.weight")
                    .transpose(2, 1, 0),
                    dtype,
                )
            },
            "w1": {
                "kernel": jnp.asarray(
                    get(f"{prefix}.feed_forward.w_1.weight").T, dtype
                ),
                "bias": jnp.asarray(get(f"{prefix}.feed_forward.w_1.bias"), dtype),
            },
            "w2": {
                "kernel": jnp.asarray(
                    get(f"{prefix}.feed_forward.w_2.weight").T, dtype
                ),
                "bias": jnp.asarray(get(f"{prefix}.feed_forward.w_2.bias"), dtype),
            },
        }

    def stack(prefix, n):
        if n == 0:
            return None
        layers = [layer_from(f"{prefix}.{i}") for i in range(n)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    return {
        "encoders0": layer_from("encoder.encoders0.0"),
        "encoders": stack("encoder.encoders", cfg.num_blocks - 1),
        "tp_encoders": stack("encoder.tp_encoders", cfg.tp_blocks),
        "after_norm": {
            "weight": jnp.asarray(get("encoder.after_norm.weight"), dtype),
            "bias": jnp.asarray(get("encoder.after_norm.bias"), dtype),
        },
        "tp_norm": {
            "weight": jnp.asarray(get("encoder.tp_norm.weight"), dtype),
            "bias": jnp.asarray(get("encoder.tp_norm.bias"), dtype),
        },
        "ctc_lo": {
            "kernel": jnp.asarray(get("ctc.ctc_lo.weight").T, dtype),
            "bias": jnp.asarray(get("ctc.ctc_lo.bias"), dtype),
        },
        "query_embed": jnp.asarray(get("embed.weight"), dtype),
    }
