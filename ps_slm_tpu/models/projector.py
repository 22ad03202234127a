"""Projector zoo: six interchangeable encoder→LLM adapters.

Behavioral parity with ``Multitask/model/projector.py`` (selected by
``model_config.encoder_projector``, dispatch at ``ps-slm.py:43-86``):

  simple_linear    EncoderProjectorLinear      projector.py:10-26
  linear           EncoderProjectorConcat      projector.py:29-50
  cov1d-linear     EncoderProjectorCov1d       projector.py:53-73
  q-former         EncoderProjectorQFormer     projector.py:76-101
  cross-attention  EncoderProjectorCTCCA       projector.py:104-126
  linear-silu      EncoderProjectorLinearSiLU  projector.py:129-151

All are functional (init/apply pairs).  Frame-concat downsampling keeps the
reference semantics (discard T % k tail frames) but on *padded* static shapes:
T is padded to a multiple of k by the caller, and validity is carried in
lengths (length // k, matching ``ps-slm.py:483``).

The cross-attention projector attends over the full LLM embedding matrix
(~152k rows).  The reference materializes [B,T,h,V] scores; here the vocab
axis is processed in chunks with an online softmax so memory stays bounded.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ps_slm_tpu.models.layers import layer_norm, linear, linear_init, ln_init

Params = Dict[str, Any]


def frame_concat(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[B,T,D] -> [B,T//k,D*k], discarding T % k tail frames
    (reference ``projector.py:19-24``)."""
    if k == 1:
        return x
    b, t, d = x.shape
    t2 = (t // k) * k
    return x[:, :t2, :].reshape(b, t2 // k, d * k)


# ----------------------------------------------------------------------------
# simple_linear — concat ×k then a single Linear to the LLM vocab (CTC head)
# ----------------------------------------------------------------------------

def init_simple_linear(key, cfg, dtype=jnp.float32) -> Params:
    k = cfg.encoder_projector_ds_rate
    return {"map": linear_init(key, cfg.encoder_dim * k, cfg.llm_dim, dtype)}


def apply_simple_linear(p: Params, cfg, x: jnp.ndarray) -> jnp.ndarray:
    return linear(frame_concat(x, cfg.encoder_projector_ds_rate), p["map"])


# ----------------------------------------------------------------------------
# linear — concat ×k → 2048 ReLU → llm_dim
# ----------------------------------------------------------------------------

def init_concat(key, cfg, dtype=jnp.float32, hidden: int = 2048) -> Params:
    k1, k2 = jax.random.split(key)
    k = cfg.encoder_projector_ds_rate
    return {
        "linear1": linear_init(k1, cfg.encoder_dim * k, hidden, dtype),
        "linear2": linear_init(k2, hidden, cfg.llm_dim, dtype),
    }


def apply_concat(p: Params, cfg, x: jnp.ndarray) -> jnp.ndarray:
    x = frame_concat(x, cfg.encoder_projector_ds_rate)
    x = jax.nn.relu(linear(x, p["linear1"]))
    return linear(x, p["linear2"])


# ----------------------------------------------------------------------------
# cov1d-linear — strided depthless Conv1d(k, stride k) → ReLU → 2048 → ReLU → llm_dim
# ----------------------------------------------------------------------------

def init_cov1d(key, cfg, dtype=jnp.float32, hidden: int = 2048) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    k = cfg.encoder_projector_ds_rate
    d = cfg.encoder_dim
    bound = 1.0 / math.sqrt(d * k)
    return {
        "conv": {
            # [k, D_in, D_out] conv kernel (lax conv dimension 'HIO')
            "kernel": jax.random.uniform(k1, (k, d, d), dtype, -bound, bound),
            "bias": jax.random.uniform(
                jax.random.fold_in(k1, 1), (d,), dtype, -bound, bound
            ),
        },
        "linear1": linear_init(k2, d, hidden, dtype),
        "linear2": linear_init(k3, hidden, cfg.llm_dim, dtype),
    }


def apply_cov1d(p: Params, cfg, x: jnp.ndarray) -> jnp.ndarray:
    k = cfg.encoder_projector_ds_rate
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["kernel"],
        window_strides=(k,), padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
    ) + p["conv"]["bias"]
    y = jax.nn.relu(y)
    y = linear(y, p["linear1"])
    y = jax.nn.relu(y)
    return linear(y, p["linear2"])


# ----------------------------------------------------------------------------
# linear-silu — LayerNorm → 2048 SiLU → llm_dim (the published TASU config)
# ----------------------------------------------------------------------------

def init_linear_silu(key, cfg, dtype=jnp.float32, bottleneck: int = 2048) -> Params:
    k1, k2 = jax.random.split(key)
    p2 = linear_init(k2, bottleneck, cfg.llm_dim, dtype)
    p2["bias"] = jnp.zeros_like(p2["bias"])  # reference zero-inits ffn[2].bias
    return {
        "norm": ln_init(cfg.encoder_dim, dtype),
        "ffn1": linear_init(k1, cfg.encoder_dim, bottleneck, dtype),
        "ffn2": p2,
    }


def apply_linear_silu(p: Params, cfg, x: jnp.ndarray) -> jnp.ndarray:
    x = layer_norm(x, p["norm"]["weight"], p["norm"]["bias"])
    x = jax.nn.silu(linear(x, p["ffn1"]))
    return linear(x, p["ffn2"])


# ----------------------------------------------------------------------------
# cross-attention — posterior queries attend over the LLM embedding matrix
# ----------------------------------------------------------------------------

def init_cross_attention(key, cfg, dtype=jnp.float32) -> Params:
    # head count is static config (cfg.ca_heads), never a param leaf: an
    # int leaf would become a tracer under jit and break the reshape
    return {
        "w_q": linear_init(key, cfg.encoder_dim, cfg.llm_dim, dtype, bias=False),
    }


def apply_cross_attention(
    p: Params, cfg, post: jnp.ndarray, llm_embed: jnp.ndarray,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Q = post @ W_q; K = V = llm_embed (stop-gradient, ps-slm.py:476-478).

    Online-softmax over vocab chunks: numerically identical to the reference's
    full [B,T,h,V] softmax (projector.py:112-126) with bounded memory.
    """
    llm_embed = jax.lax.stop_gradient(llm_embed)
    h = getattr(cfg, "ca_heads", 8)
    b, t, _ = post.shape
    q = linear(post, p["w_q"])                      # [B,T,D]
    d_model = q.shape[-1]
    d = d_model // h
    q = q.reshape(b, t, h, d).astype(jnp.float32)
    v_total = llm_embed.shape[0]
    n_chunks = -(-v_total // chunk)
    pad = n_chunks * chunk - v_total
    kv = jnp.pad(llm_embed.astype(jnp.float32), ((0, pad), (0, 0)))
    kv = kv.reshape(n_chunks, chunk, h, d)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n_chunks, chunk), 0) * chunk
        + jax.lax.broadcasted_iota(jnp.int32, (n_chunks, chunk), 1)
    ) < v_total

    scale = d ** -0.5

    def step(carry, inp):
        m, l, acc = carry
        kv_c, valid_c = inp
        s = jnp.einsum("bthd,vhd->bthv", q, kv_c) * scale
        s = jnp.where(valid_c[None, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p_ = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p_, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum("bthv,vhd->bthd", p_, kv_c)
        return (m_new, l, acc), None

    m0 = jnp.full((b, t, h), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, t, h), jnp.float32)
    acc0 = jnp.zeros((b, t, h, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, acc0), (kv, valid))
    out = acc / l[..., None]
    return out.reshape(b, t, d_model).astype(post.dtype)


# ----------------------------------------------------------------------------
# q-former — BLIP-2 style querying transformer (cross-attn every 2nd layer)
# ----------------------------------------------------------------------------

def init_qformer(
    key, cfg, dtype=jnp.float32,
    hidden: int = 768, heads: Optional[int] = None, intermediate: int = 3072,
    cross_attention_frequency: int = 2,
) -> Params:
    """Minimal Blip2QFormer (``projector.py:76-101``): learned queries,
    self-attn + (periodic) cross-attn + FFN, post-LN convention.

    ``heads`` defaults to ``cfg.qformer_heads``; the head count is static
    config and must match at apply time (it is not stored in the params).
    """
    if heads is None:
        heads = getattr(cfg, "qformer_heads", 12)
    n_layers = cfg.qformer_layers
    query_len = cfg.query_len
    keys = jax.random.split(key, n_layers + 3)
    layers = []
    for i in range(n_layers):
        lk = jax.random.split(keys[i], 12)
        layer = {
            "self_q": linear_init(lk[0], hidden, hidden, dtype),
            "self_k": linear_init(lk[1], hidden, hidden, dtype),
            "self_v": linear_init(lk[2], hidden, hidden, dtype),
            "self_o": linear_init(lk[3], hidden, hidden, dtype),
            "ln_self": ln_init(hidden, dtype),
            "ffn1": linear_init(lk[8], hidden, intermediate, dtype),
            "ffn2": linear_init(lk[9], intermediate, hidden, dtype),
            "ln_ffn": ln_init(hidden, dtype),
        }
        if i % cross_attention_frequency == 0:
            layer.update({
                "cross_q": linear_init(lk[4], hidden, hidden, dtype),
                "cross_k": linear_init(lk[5], cfg.encoder_dim, hidden, dtype),
                "cross_v": linear_init(lk[6], cfg.encoder_dim, hidden, dtype),
                "cross_o": linear_init(lk[7], hidden, hidden, dtype),
                "ln_cross": ln_init(hidden, dtype),
            })
        layers.append(layer)
    return {
        "query": jax.random.normal(keys[-3], (1, query_len, hidden), dtype),
        "ln_embed": ln_init(hidden, dtype),
        "layers": layers,
        "out": linear_init(keys[-2], hidden, cfg.llm_dim, dtype),
        "out_norm": ln_init(cfg.llm_dim, dtype),
    }


def _qf_attention(q, k, v, heads, mask=None):
    b, tq, d = q.shape
    tk = k.shape[1]
    hd = d // heads
    qh = q.reshape(b, tq, heads, hd)
    kh = k.reshape(b, tk, heads, hd)
    vh = v.reshape(b, tk, heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) / math.sqrt(hd)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -1e30)
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", a, vh)
    return out.reshape(b, tq, d)


def apply_qformer(
    p: Params, cfg, x: jnp.ndarray, atts: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """x: [B,T,encoder_dim]; atts: [B,T] validity. Returns [B,query_len,llm_dim]."""
    b = x.shape[0]
    heads = getattr(cfg, "qformer_heads", 12)
    h = jnp.broadcast_to(p["query"], (b,) + p["query"].shape[1:])
    h = layer_norm(h, p["ln_embed"]["weight"], p["ln_embed"]["bias"], eps=1e-12)
    for layer in p["layers"]:
        sa = _qf_attention(
            linear(h, layer["self_q"]), linear(h, layer["self_k"]),
            linear(h, layer["self_v"]), heads,
        )
        h = layer_norm(
            h + linear(sa, layer["self_o"]),
            layer["ln_self"]["weight"], layer["ln_self"]["bias"], eps=1e-12,
        )
        if "cross_q" in layer:
            ca = _qf_attention(
                linear(h, layer["cross_q"]), linear(x, layer["cross_k"]),
                linear(x, layer["cross_v"]), heads, mask=atts,
            )
            h = layer_norm(
                h + linear(ca, layer["cross_o"]),
                layer["ln_cross"]["weight"], layer["ln_cross"]["bias"], eps=1e-12,
            )
        ff = linear(jax.nn.gelu(linear(h, layer["ffn1"]), approximate=False),
                    layer["ffn2"])
        h = layer_norm(
            h + ff, layer["ln_ffn"]["weight"], layer["ln_ffn"]["bias"], eps=1e-12
        )
    out = linear(h, p["out"])
    return layer_norm(out, p["out_norm"]["weight"], p["out_norm"]["bias"])


# ----------------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------------

_PROJECTORS = {
    "simple_linear": (init_simple_linear, apply_simple_linear),
    "linear": (init_concat, apply_concat),
    "cov1d-linear": (init_cov1d, apply_cov1d),
    "linear-silu": (init_linear_silu, apply_linear_silu),
    "cross-attention": (init_cross_attention, apply_cross_attention),
    "q-former": (init_qformer, apply_qformer),
}


def init_projector(key, model_cfg, dtype=jnp.float32) -> Params:
    name = model_cfg.encoder_projector
    if name not in _PROJECTORS:
        raise KeyError(f"unknown projector {name!r}; known: {sorted(_PROJECTORS)}")
    return _PROJECTORS[name][0](key, model_cfg, dtype)


def apply_projector(p: Params, model_cfg, x, *extra):
    return _PROJECTORS[model_cfg.encoder_projector][1](p, model_cfg, x, *extra)


def downsample_rate(model_cfg) -> int:
    """`k` used for length bookkeeping (ps-slm.py:483,489,506,523)."""
    if model_cfg.encoder_projector in ("linear-silu", "cross-attention"):
        return 1
    return model_cfg.encoder_projector_ds_rate
