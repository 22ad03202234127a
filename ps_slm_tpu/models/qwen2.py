"""Qwen2/Qwen2.5 decoder LLM, TPU-native.

Replaces the reference's HF ``AutoModelForCausalLM`` usage
(``Multitask/model/ps-slm.py:89-127,530,660-675``) with a functional JAX
implementation: RMSNorm, rotary embeddings, GQA attention (Pallas flash on
TPU), SwiGLU MLP, tied or untied LM head.  Parameters are a pytree with
**stacked layer leaves** (leading axis = layer) consumed by ``lax.scan`` —
one compiled block regardless of depth, which is both compile-time- and
remat-friendly.

Checkpoint compatibility: :func:`load_hf_checkpoint` reads HF safetensors
(``model.layers.N.self_attn.q_proj.weight`` etc.) bit-exactly into the pytree;
:func:`params_to_hf` inverts it (used by the ``pytorch_model.bin`` exporter).

Numerics policy (reference parity): RMSNorm/softmax in fp32, matmuls in the
param dtype (bf16 on TPU) with fp32 accumulation.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ps_slm_tpu.ops.attention import attention, mha_reference

Params = Dict[str, Any]


@dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 32768
    attention_bias: bool = True   # Qwen2 uses bias on q/k/v projections

    @staticmethod
    def tiny(**kw) -> "Qwen2Config":
        """Small config for tests."""
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, rope_theta=10000.0,
        )
        base.update(kw)
        return Qwen2Config(**base)

    @staticmethod
    def from_hf(config: dict) -> "Qwen2Config":
        """Build from an HF ``config.json`` dict."""
        hd = config.get("head_dim") or (
            config["hidden_size"] // config["num_attention_heads"]
        )
        return Qwen2Config(
            vocab_size=config["vocab_size"],
            hidden_size=config["hidden_size"],
            intermediate_size=config["intermediate_size"],
            num_hidden_layers=config["num_hidden_layers"],
            num_attention_heads=config["num_attention_heads"],
            num_key_value_heads=config["num_key_value_heads"],
            head_dim=hd,
            rope_theta=config.get("rope_theta", 1e6),
            rms_norm_eps=config.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=config.get("tie_word_embeddings", False),
            max_position_embeddings=config.get("max_position_embeddings", 32768),
        )


# ----------------------------------------------------------------------------
# Parameter init / IO
# ----------------------------------------------------------------------------

def init_params(key, cfg: Qwen2Config, dtype=jnp.float32) -> Params:
    """Random init (tests / from-scratch training)."""
    h, i = cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    L = cfg.num_hidden_layers
    ks = jax.random.split(key, 10)

    def norm_init(k, shape, fan_in):
        return (jax.random.normal(k, shape) / math.sqrt(fan_in)).astype(dtype)

    layers = {
        "input_layernorm": jnp.ones((L, h), dtype),
        "post_attention_layernorm": jnp.ones((L, h), dtype),
        "q_proj": {"kernel": norm_init(ks[0], (L, h, nh * hd), h)},
        "k_proj": {"kernel": norm_init(ks[1], (L, h, nkv * hd), h)},
        "v_proj": {"kernel": norm_init(ks[2], (L, h, nkv * hd), h)},
        "o_proj": {"kernel": norm_init(ks[3], (L, nh * hd, h), nh * hd)},
        "gate_proj": {"kernel": norm_init(ks[4], (L, h, i), h)},
        "up_proj": {"kernel": norm_init(ks[5], (L, h, i), h)},
        "down_proj": {"kernel": norm_init(ks[6], (L, i, h), i)},
    }
    if cfg.attention_bias:
        layers["q_proj"]["bias"] = jnp.zeros((L, nh * hd), dtype)
        layers["k_proj"]["bias"] = jnp.zeros((L, nkv * hd), dtype)
        layers["v_proj"]["bias"] = jnp.zeros((L, nkv * hd), dtype)

    params: Params = {
        "embed_tokens": norm_init(ks[7], (cfg.vocab_size, h), h),
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm_init(ks[8], (h, cfg.vocab_size), h)
    return params


_HF_LAYER_KEYS = {
    "input_layernorm.weight": ("input_layernorm", None),
    "post_attention_layernorm.weight": ("post_attention_layernorm", None),
    "self_attn.q_proj.weight": ("q_proj", "kernel"),
    "self_attn.k_proj.weight": ("k_proj", "kernel"),
    "self_attn.v_proj.weight": ("v_proj", "kernel"),
    "self_attn.o_proj.weight": ("o_proj", "kernel"),
    "self_attn.q_proj.bias": ("q_proj", "bias"),
    "self_attn.k_proj.bias": ("k_proj", "bias"),
    "self_attn.v_proj.bias": ("v_proj", "bias"),
    "mlp.gate_proj.weight": ("gate_proj", "kernel"),
    "mlp.up_proj.weight": ("up_proj", "kernel"),
    "mlp.down_proj.weight": ("down_proj", "kernel"),
}


def load_hf_checkpoint(
    path: str, cfg: Optional[Qwen2Config] = None, dtype=jnp.bfloat16
) -> Tuple[Params, Qwen2Config]:
    """Load an HF Qwen2 checkpoint directory (safetensors) into the pytree.

    Torch ``Linear.weight`` is [out, in]; JAX kernels are [in, out] → transpose.
    """
    from safetensors import safe_open

    if cfg is None:
        with open(os.path.join(path, "config.json")) as f:
            cfg = Qwen2Config.from_hf(json.load(f))

    tensors: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)

    return hf_tensors_to_params(tensors, cfg, dtype), cfg


def hf_tensors_to_params(
    tensors: Dict[str, np.ndarray], cfg: Qwen2Config, dtype=jnp.bfloat16,
    consumed: Optional[set] = None,
) -> Params:
    """Map a flat HF state dict (numpy) onto the stacked-layer pytree.

    ``consumed`` (optional out-param): receives the tensor keys actually
    read, so strict=False importers can report unmatched keys honestly
    instead of assuming every ``llm.*`` key loaded."""
    L = cfg.num_hidden_layers

    def get(name):
        # some exports prefix with "model."
        for cand in (name, f"model.{name}"):
            if cand in tensors:
                if consumed is not None:
                    consumed.add(cand)
                return tensors[cand]
        raise KeyError(name)

    def stack(suffix, transpose):
        mats = []
        for l in range(L):
            m = np.asarray(get(f"layers.{l}.{suffix}"))
            mats.append(m.T if transpose else m)
        return jnp.asarray(np.stack(mats), dtype)

    layers: Params = {}
    for suffix, (name, leaf) in _HF_LAYER_KEYS.items():
        transpose = leaf == "kernel"
        try:
            arr = stack(suffix, transpose)
        except KeyError:
            if suffix.endswith("bias"):
                continue  # bias-free variants
            raise
        if leaf is None:
            layers[name] = arr
        else:
            layers.setdefault(name, {})[leaf] = arr

    params: Params = {
        "embed_tokens": jnp.asarray(get("embed_tokens.weight"), dtype),
        "layers": layers,
        "norm": jnp.asarray(get("norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings:
        lm = tensors.get("lm_head.weight")
        if lm is None:
            raise KeyError("lm_head.weight (untied config)")
        if consumed is not None:
            consumed.add("lm_head.weight")
        params["lm_head"] = jnp.asarray(np.asarray(lm).T, dtype)
    return params


def params_to_hf(params: Params, cfg: Qwen2Config) -> Dict[str, np.ndarray]:
    """Inverse of :func:`hf_tensors_to_params` (for checkpoint export)."""
    out: Dict[str, np.ndarray] = {}
    out["model.embed_tokens.weight"] = np.asarray(
        params["embed_tokens"], np.float32
    )
    out["model.norm.weight"] = np.asarray(params["norm"], np.float32)
    layers = params["layers"]
    for suffix, (name, leaf) in _HF_LAYER_KEYS.items():
        node = layers.get(name)
        if node is None:
            continue
        arr = node if leaf is None else node.get(leaf)
        if arr is None:
            continue
        arr = np.asarray(arr, np.float32)
        for l in range(cfg.num_hidden_layers):
            m = arr[l]
            if leaf == "kernel":
                m = m.T
            out[f"model.layers.{l}.{suffix}"] = m
    if "lm_head" in params:
        out["lm_head.weight"] = np.asarray(params["lm_head"], np.float32).T
    return out


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm with fp32 statistics (HF Qwen2RMSNorm semantics).

    Dispatches to the fused Pallas kernel on TPU (ops/norms.py)."""
    from ps_slm_tpu.ops.norms import (
        fused_rms_norm, norms_eligible, rms_norm_ref,
    )

    if norms_eligible(x.shape[-1]):
        return fused_rms_norm(x, weight, eps)
    # jnp path with a residual-thin custom VJP (stashes bf16 x + fp32 rstd
    # instead of the fp32 upcast — ops/norms.py rms_norm_ref)
    return rms_norm_ref(x, weight, eps)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, rotate-half convention (HF Qwen2/Llama).

    x: [B,S,H,D]; positions: [B,S] int32.
    """
    d = x.shape[-1]
    freqs = 1.0 / (
        theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )  # [D/2]
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B,S,D/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _linear(x, p, lora_ctx=None):
    if "q8" in p:  # int8 weight-only (ps_slm_tpu.models.quantization)
        from ps_slm_tpu.models.quantization import q8_matmul

        y = q8_matmul(x, p)
    elif "q4" in p:  # group-wise int4 weight-only
        from ps_slm_tpu.models.quantization import q4_matmul

        y = q4_matmul(x, p)
    else:
        y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    if "lora_a" in p:  # LoRA adapter (ps_slm_tpu.models.lora)
        xl = x
        if lora_ctx is not None:
            # peft-style lora_dropout: inverted dropout on the adapter input
            # only (base path untouched), train mode only
            key, rate, idx = lora_ctx
            keep = jax.random.bernoulli(
                jax.random.fold_in(key, idx), 1.0 - rate, x.shape
            )
            xl = jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
        y = y + ((xl @ p["lora_a"]) @ p["lora_b"]) * p["lora_scale"]
    return y


def _adaption_attention(lp, cfg, q):
    """LLaMA-Adapter zero-init attention (models/lora.py::add_llama_adapter;
    reference dispatch utils/config_utils.py:43-58 -> peft
    AdaptionPromptConfig / AdaptedAttention semantics).

    K/V of the learned per-layer prompt come from the layer's own
    k_proj/v_proj on the RAW prompt (no layernorm, and — matching peft —
    no rope on the adapter keys); the query is the already-roped q.  A
    separate softmax over the P prompt positions is scaled by the
    per-layer zero-init gate and the context is added to the attention
    output BEFORE o_proj — equivalent to peft's post-o_proj add because
    Qwen2's o_proj is bias-free and linear.  Never enters the KV cache
    (recomputed from params each call, like the prefix)."""
    b, s, nh, hd = q.shape
    nkv = cfg.num_key_value_heads
    prompt = lp["adaption_prompt"].astype(q.dtype)          # [P, hidden]
    ak = _linear(prompt, lp["k_proj"]).reshape(-1, nkv, hd)
    av = _linear(prompt, lp["v_proj"]).reshape(-1, nkv, hd)
    qg = q.reshape(b, s, nkv, nh // nkv, hd)
    scores = jnp.einsum("bskrd,pkd->bskrp", qg, ak).astype(jnp.float32)
    probs = jax.nn.softmax(scores * (hd ** -0.5), axis=-1)
    # gate AFTER softmax (peft: scores = adaption_gate * softmax(scores));
    # the frozen 0/1 mask zeroes non-adapted layers AND their gradients
    gate = (lp["adaption_gate"] * lp["adaption_mask"]).astype(jnp.float32)
    ctx = jnp.einsum(
        "bskrp,pkd->bskrd", (gate * probs).astype(q.dtype),
        av.astype(q.dtype),
    )
    return ctx.reshape(b, s, nh, hd)


def _block(
    lp: Params,
    cfg: Qwen2Config,
    x: jnp.ndarray,
    positions: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray],
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    cache_index: Optional[jnp.ndarray],
    use_flash: Optional[bool],
    lora_key=None,
    lora_dropout: float = 0.0,
):
    """One transformer block. Returns (x_out, (k_cache, v_cache))."""
    b, s, h = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def ctx(idx):
        if lora_key is None or lora_dropout <= 0.0:
            return None
        return (lora_key, lora_dropout, idx)

    y = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
    q = _linear(y, lp["q_proj"], ctx(0)).reshape(b, s, nh, hd)
    k = _linear(y, lp["k_proj"], ctx(1)).reshape(b, s, nkv, hd)
    v = _linear(y, lp["v_proj"], ctx(2)).reshape(b, s, nkv, hd)
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)

    def with_prefix(k_all, v_all, mask, offset):
        # prefix-tuning (models/lora.py::add_prefix_tuning): prepend the
        # learned per-layer KV prefix — un-rotated raw KV, always visible
        # (peft PrefixTuningConfig past_key_values semantics; reference
        # dispatch at utils/config_utils.py:43-58).  Never written to the
        # KV cache: it is re-read from params each call, so decode caches
        # stay prefix-agnostic.
        pk, pv = lp["prefix_k"], lp["prefix_v"]
        n_pre = pk.shape[0]
        pk = jnp.broadcast_to(pk[None].astype(k_all.dtype), (b,) + pk.shape)
        pv = jnp.broadcast_to(pv[None].astype(v_all.dtype), (b,) + pv.shape)
        k_all = jnp.concatenate([pk, k_all], axis=1)
        v_all = jnp.concatenate([pv, v_all], axis=1)
        if mask is not None:
            ones = jnp.ones((b, n_pre), mask.dtype)
            mask = jnp.concatenate([ones, mask], axis=1)
        # prefix shifts every cached/current kv position by n_pre, so the
        # causal compare needs the query offset bumped by n_pre too
        offset = n_pre if offset is None else jnp.asarray(offset) + n_pre
        return k_all, v_all, mask, offset

    has_prefix = "prefix_k" in lp

    if cache_kv is not None:
        if len(cache_kv) == 4:
            # int8 KV cache: quantize this chunk at write; the read-side
            # convert+scale fuses into the attention matmuls, so HBM sees
            # only the int8 cells + per-vector scales
            from ps_slm_tpu.models.quantization import quantize_kv

            k8, kscale, v8, vscale = cache_kv
            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            if jnp.ndim(cache_index) == 1:
                rows = jnp.arange(b)[:, None]
                cols = cache_index[:, None] + jnp.arange(s)[None, :]
                k8 = k8.at[rows, cols].set(kq)
                kscale = kscale.at[rows, cols].set(ks)
                v8 = v8.at[rows, cols].set(vq)
                vscale = vscale.at[rows, cols].set(vs)
            else:
                k8 = jax.lax.dynamic_update_slice(
                    k8, kq, (0, cache_index, 0, 0)
                )
                kscale = jax.lax.dynamic_update_slice(
                    kscale, ks, (0, cache_index, 0)
                )
                v8 = jax.lax.dynamic_update_slice(
                    v8, vq, (0, cache_index, 0, 0)
                )
                vscale = jax.lax.dynamic_update_slice(
                    vscale, vs, (0, cache_index, 0)
                )
            k_cache = k8.astype(q.dtype) * kscale[..., None].astype(q.dtype)
            v_cache = v8.astype(q.dtype) * vscale[..., None].astype(q.dtype)
            new_cache = (k8, kscale, v8, vscale)
        else:
            k_cache, v_cache = cache_kv
            if jnp.ndim(cache_index) == 1:
                # per-row write offsets (continuous-batching slot pool:
                # every sequence in the batch is at its own length)
                rows = jnp.arange(b)[:, None]
                cols = cache_index[:, None] + jnp.arange(s)[None, :]
                k_cache = k_cache.at[rows, cols].set(k.astype(k_cache.dtype))
                v_cache = v_cache.at[rows, cols].set(v.astype(v_cache.dtype))
            else:
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k.astype(k_cache.dtype), (0, cache_index, 0, 0)
                )
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v.astype(v_cache.dtype), (0, cache_index, 0, 0)
                )
            new_cache = (k_cache, v_cache)
        k_att, v_att, mask_att, off_att = k_cache, v_cache, attn_mask, cache_index
        if has_prefix:
            k_att, v_att, mask_att, off_att = with_prefix(
                k_cache, v_cache, attn_mask, cache_index
            )
        attn = mha_reference(
            q, k_att, v_att, kv_mask=mask_att, causal=True,
            q_offset=off_att,
        )
    else:
        if has_prefix:
            k_att, v_att, mask_att, off_att = with_prefix(k, v, attn_mask, None)
            attn = mha_reference(
                q, k_att, v_att, kv_mask=mask_att, causal=True,
                q_offset=off_att,
            )
        else:
            attn = attention(
                q, k, v, kv_mask=attn_mask, causal=True, use_flash=use_flash
            )
        new_cache = (k, v)

    if "adaption_prompt" in lp:
        attn = attn + _adaption_attention(lp, cfg, q)
    x = x + _linear(attn.reshape(b, s, nh * hd), lp["o_proj"], ctx(3))

    y = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    gate = _linear(y, lp["gate_proj"], ctx(4))
    up = _linear(y, lp["up_proj"], ctx(5))
    x = x + _linear(jax.nn.silu(gate) * up, lp["down_proj"], ctx(6))
    return x, new_cache


def embed(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed_tokens"][input_ids]


def unembed(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """hidden -> vocab logits (fp32)."""
    w = params.get("lm_head")
    if w is None:
        w = params["embed_tokens"].T
    return (hidden @ w.astype(hidden.dtype)).astype(jnp.float32)


def forward(
    params: Params,
    cfg: Qwen2Config,
    inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_index: Optional[jnp.ndarray] = None,
    *,
    use_flash: Optional[bool] = None,
    remat: bool = False,
    lora_dropout_rng: Optional[jax.Array] = None,
    lora_dropout: float = 0.0,
    pipeline_mesh=None,
    pp_microbatches: int = 0,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Run the decoder stack. Returns (last_hidden, new_cache).

    attention_mask: [B, T] with T == S (no cache) or T == cache capacity.
    position_ids:   [B, S]; default = cumsum over attention_mask (HF semantics,
                    matches the merge's position_ids at ps-slm.py:871).
    cache:          {"k": [L,B,T,nkv,hd], "v": ...} bucketed KV cache.
    cache_index:    scalar int — write offset of this chunk in the cache.
    lora_dropout*:  train-mode peft lora_dropout on the adapter inputs
                    (aispeech_asr_config.py:48); active only when both the
                    rate and an rng are supplied (training path, no cache).
    pipeline_mesh:  a Mesh whose ``pipe`` axis is > 1 routes the (no-cache)
                    layer stack through the GPipe schedule
                    (parallel/pipeline.py) with ``pp_microbatches``
                    microbatches; cache paths always use the plain scan.
    """
    b, s, _ = inputs_embeds.shape
    if position_ids is None:
        if attention_mask is not None and cache is None:
            am = attention_mask.astype(jnp.int32)
            position_ids = jnp.clip(jnp.cumsum(am, axis=-1) - 1, 0, None)
        else:
            base = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
            if cache_index is None:
                position_ids = base
            else:
                # per-row [B] cache_index (slot pools) broadcasts over S;
                # scalar cache_index broadcasts over both axes
                off = jnp.asarray(cache_index)
                position_ids = base + (
                    off[:, None] if off.ndim == 1 else off
                )
        if "prefix_k" in params["layers"]:
            # prefix-tuning: the learned KV prefix occupies the first P
            # cache slots in the reference stack (peft past_key_values ->
            # HF counts them in cache_position), so real tokens rope from
            # position P, not 0 — required for logit parity with a peft
            # PrefixTuning model (tests/test_qwen2_parity.py)
            position_ids = position_ids + params["layers"]["prefix_k"].shape[1]

    x = inputs_embeds

    if cache is not None:
        _ckeys = cache_leaf_keys(cache)
        cache_kv_stacked = tuple(cache[key] for key in _ckeys)
    else:
        cache_kv_stacked = None

    def body(x, layer_and_cache):
        lp, ckv = layer_and_cache
        x, new_ckv = _block(
            lp, cfg, x, position_ids, attention_mask, ckv, cache_index,
            use_flash,
        )
        return x, new_ckv

    if remat:
        body = jax.checkpoint(body)

    # layer-scan unroll (PS_SCAN_UNROLL): >1 trades compile time for less
    # per-iteration overhead / cross-layer fusion headroom
    import os as _os

    unroll = int(_os.environ.get("PS_SCAN_UNROLL", "1"))
    if cache_kv_stacked is not None:
        x, new_leaves = jax.lax.scan(
            body, x, (params["layers"], cache_kv_stacked), unroll=unroll
        )
        new_cache = dict(zip(_ckeys, new_leaves))
    elif (
        pipeline_mesh is not None
        and pipeline_mesh.shape.get("pipe", 1) > 1
    ):
        from ps_slm_tpu.parallel.pipeline import pipeline_apply

        use_lora_drop = lora_dropout > 0.0 and lora_dropout_rng is not None
        layer_keys = (
            jax.random.split(lora_dropout_rng, cfg.num_hidden_layers)
            if use_lora_drop else None
        )

        def block_fn(lp, xb, pos, msk, lkey):
            xb, _ = _block(
                lp, cfg, xb, pos, msk, None, None, use_flash,
                lora_key=lkey,
                lora_dropout=lora_dropout if use_lora_drop else 0.0,
            )
            return xb

        x = pipeline_apply(
            pipeline_mesh, block_fn, params["layers"], x, position_ids,
            attention_mask, layer_keys, n_micro=pp_microbatches,
            remat=remat,
        )
        new_cache = None
    else:
        use_lora_drop = lora_dropout > 0.0 and lora_dropout_rng is not None
        n_layers = cfg.num_hidden_layers
        layer_keys = (
            jax.random.split(lora_dropout_rng, n_layers)
            if use_lora_drop else None
        )

        def body_nocache(x, xs):
            lp, lkey = xs
            x, _ = _block(
                lp, cfg, x, position_ids, attention_mask, None, None,
                use_flash, lora_key=lkey,
                lora_dropout=lora_dropout if use_lora_drop else 0.0,
            )
            return x, None
        if remat:
            body_nocache = jax.checkpoint(body_nocache)
        x, _ = jax.lax.scan(
            body_nocache, x, (params["layers"], layer_keys), unroll=unroll
        )
        new_cache = None

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_cache


def logits_fn(params: Params, cfg: Qwen2Config, hidden: jnp.ndarray) -> jnp.ndarray:
    return unembed(params, hidden)


def init_cache(
    cfg: Qwen2Config, batch: int, capacity: int, dtype=jnp.bfloat16,
    kv_bits: int = 16,
) -> Dict[str, jnp.ndarray]:
    """Bucketed KV cache.  kv_bits=8 stores int8 cells + one f32 scale per
    [head_dim] vector (models/quantization.py::quantize_kv) — half the
    cache HBM traffic; every cache leaf keeps capacity on axis 2 so
    slot-pool/beam cache surgery stays layout-generic."""
    shape = (
        cfg.num_hidden_layers, batch, capacity,
        cfg.num_key_value_heads, cfg.head_dim,
    )
    if kv_bits == 8:
        return {
            "k8": jnp.zeros(shape, jnp.int8),
            "kscale": jnp.zeros(shape[:-1], jnp.float32),
            "v8": jnp.zeros(shape, jnp.int8),
            "vscale": jnp.zeros(shape[:-1], jnp.float32),
        }
    if kv_bits != 16:
        raise ValueError(f"kv_bits must be 8 or 16, got {kv_bits}")
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def cache_leaf_keys(cache: Dict[str, jnp.ndarray]):
    """Ordered leaf names of a cache dict (fp or int8 layout)."""
    return ("k8", "kscale", "v8", "vscale") if "k8" in cache else ("k", "v")
