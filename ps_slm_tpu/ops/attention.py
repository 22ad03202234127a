"""Attention ops with TPU (Pallas flash) and XLA reference paths.

TPU-native replacement for the reference's fused-attention surface:
``torch.nn.functional.scaled_dot_product_attention`` /
``torch_npu.npu_fusion_attention`` (``Multitask/utils/npu_flash_attn.py:13-52``)
and the Qwen2 HF SDPA path (``Multitask/model/ps-slm.py:530``).

Design:
  * GQA layout q:[B,S,Hq,D]  k,v:[B,T,Hkv,D]  with Hq % Hkv == 0.
  * Padding via kv_mask [B,T] (True = valid).  Causality via a flag plus an
    optional per-query position offset (`q_offset`, for KV-cache decode).
  * On TPU with long sequences the Pallas flash kernel
    (:mod:`ps_slm_tpu.ops.flash_attention`) is used for the full-sequence
    forward/backward; otherwise a fused-by-XLA einsum path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    q_offset: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """XLA attention. Softmax in fp32 (reference LayerNorm/softmax-fp32 policy,
    ``SenseVoice.py:270-282``); output in q.dtype.

    q: [B,S,Hq,D]; k,v: [B,T,Hkv,D]; kv_mask: [B,T] True=valid.
    causal: mask positions where kv_pos > q_pos + q_offset.

    GQA uses a grouped einsum ([B,S,Hkv,rep,D] x [B,T,Hkv,D]) rather than
    materializing replicated K/V — measured ~25% faster at 1.5B shapes
    (docs/PERF.md).
    """
    b, s, hq, d = q.shape
    _, t, hkv, _ = k.shape
    n_rep = hq // hkv
    scale = scale if scale is not None else d ** -0.5

    qg = q.reshape(b, s, hkv, n_rep, d)

    mask = None
    if kv_mask is not None:
        mask = kv_mask[:, None, None, None, :]  # [B,1,1,1,T]
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (b, s, t), 1)
        if q_offset is not None:
            offset = jnp.asarray(q_offset, jnp.int32)
            offset = jnp.broadcast_to(offset, (b,))
            q_pos = q_pos + offset[:, None, None]
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (b, s, t), 2)
        causal_mask = (kv_pos <= q_pos)[:, None, None, :, :]  # [B,1,1,S,T]
        mask = causal_mask if mask is None else jnp.logical_and(mask, causal_mask)

    out = _mha_core(qg, k, v, mask, scale)
    return out.reshape(b, s, hq, d).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _mha_core(qg, k, v, mask, scale):
    """Grouped-GQA attention core: qg [B,S,Hkv,rep,D] -> out [B,S,Hkv,rep,D].

    custom_vjp so the softmax residual is stashed in ``v.dtype`` instead of
    the fp32 JAX AD would keep: at flagship shapes the probs tensor is
    [28L,5,2,6,543,543] = 2 GB/step of HBM write+read traffic per training
    step (profiled in benchmarks/mfu_floor.py) — bf16 halves it.  On fp32
    runs (CPU tests) v.dtype == fp32 and the math is unchanged.  The
    backward recomputes nothing: dv/dp are matmuls off the stashed probs,
    and the softmax VJP p*(dp - sum(p*dp)) runs in fp32 off the upcast.
    """
    out, _ = _mha_core_fwd(qg, k, v, mask, scale)
    return out


def _mha_probs(qg, k, mask, scale):
    logits = (
        jnp.einsum("bskrd,btkd->bkrst", qg, k).astype(jnp.float32) * scale
    )  # [B,Hkv,rep,S,T]
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if mask is not None:
        # rows that are fully masked produce uniform softmax; zero them out
        probs = jnp.where(mask, probs, 0.0)
    return probs


def _mha_core_fwd(qg, k, v, mask, scale):
    probs = _mha_probs(qg, k, mask, scale).astype(v.dtype)
    out = jnp.einsum("bkrst,btkd->bskrd", probs, v)
    return out, (qg, k, v, probs, out)


def _mha_core_bwd(scale, res, dout):
    qg, k, v, probs, out = res
    dv = jnp.einsum("bkrst,bskrd->btkd", probs, dout).astype(v.dtype)
    dp = jnp.einsum("bskrd,btkd->bkrst", dout, v)
    # softmax-VJP rowsum via the flash-attention identity:
    #   sum_t p_st * dp_st = sum_t p_st * (dout_s . v_t) = dout_s . out_s
    # — a [*, S, D] row-dot off the stashed output instead of a second
    # full fp32 pass over the [*, S, T] probs/dp tensors (profiled ~2 GB
    # of HBM traffic at flagship shapes, benchmarks/mfu_floor.py).
    delta = jnp.einsum(
        "bskrd,bskrd->bskr",
        dout.astype(jnp.float32), out.astype(jnp.float32),
    )  # [B,S,Hkv,rep]
    delta = jnp.transpose(delta, (0, 2, 3, 1))[..., None]  # [B,Hkv,rep,S,1]
    # masked positions have p == 0 so their ds vanishes, and fully-masked
    # rows give p == 0 AND out == 0 (hence delta == 0) — matching the
    # where/NEG_INF chain of the forward
    ds = probs.astype(jnp.float32) * (dp.astype(jnp.float32) - delta)
    ds = (ds * scale).astype(k.dtype)
    dqg = jnp.einsum("bkrst,btkd->bskrd", ds, k).astype(qg.dtype)
    dk = jnp.einsum("bkrst,bskrd->btkd", ds, qg).astype(k.dtype)
    return dqg, dk, dv, None


_mha_core.defvjp(_mha_core_fwd, _mha_core_bwd)


@functools.partial(
    jax.jit, static_argnames=("causal", "use_flash", "scale")
)
def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    q_offset: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    use_flash: Optional[bool] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Dispatching attention entry point.

    `use_flash=None` auto-selects the Pallas flash kernel on TPU for
    full-sequence shapes (S == T, no decode offset) above a size threshold.
    """
    if use_flash is None:
        use_flash = _flash_eligible(q, k, q_offset)
    if use_flash:
        from ps_slm_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, kv_mask=kv_mask, causal=causal, scale=scale
        )
    return mha_reference(
        q, k, v, kv_mask=kv_mask, causal=causal, q_offset=q_offset, scale=scale
    )


def _flash_eligible(q, k, q_offset) -> bool:
    """Auto-select the Pallas flash kernel only where it wins.

    Measured fwd+bwd on v5e (docs/PERF.md): XLA's fused attention wins
    below ~1024 tokens (grid overhead dominates tiny per-program work);
    the Pallas kernel wins above (2.8x at 2048, 4.4x fwd at 4096) and its
    O(T) memory avoids the S^2 score matrix.
    """
    if q_offset is not None:
        return False
    if q.shape[1] != k.shape[1]:
        return False
    if q.shape[1] < 1024 or q.shape[3] % 128 != 0:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,
) -> jnp.ndarray:
    """Single-step decode attention against a bucketed KV cache.

    q: [B,1,Hq,D]; caches: [B,Tmax,Hkv,D]; cache_len: [B] valid entries
    (the new token's k/v must already be written at cache_len-1).
    """
    t = k_cache.shape[1]
    kv_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], t), 1)
        < cache_len[:, None]
    )
    return mha_reference(q, k_cache, v_cache, kv_mask=kv_mask, causal=False)
