"""Int8 KV cache (kv_bits=8): quantization bounds, cached-forward accuracy,
and pool-vs-static agreement under the quantized cache.

Beyond-reference serving feature: decode is KV-HBM-bound at long context;
int8 cells halve cache traffic (models/quantization.py::quantize_kv,
models/qwen2.py cache plumbing)."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.models import qwen2
from ps_slm_tpu.models.quantization import dequantize_kv, quantize_kv

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)

EOS = 9
PREFILL = 8
MAX_NEW = 12


def _model(vocab=32, hidden=32):
    cfg = qwen2.Qwen2Config.tiny(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8,
    )
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_quantize_kv_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 7, 2, 16)).astype(np.float32)) * 4.0
    q, scale = quantize_kv(x)
    assert q.dtype == jnp.int8 and scale.shape == (3, 7, 2)
    back = np.asarray(dequantize_kv(q, scale, jnp.float32))
    bound = np.abs(np.asarray(x)).max(axis=-1, keepdims=True) / 127.0 * 0.51
    assert (np.abs(back - np.asarray(x)) <= bound + 1e-6).all()


def test_init_cache_q8_layout():
    cfg, _ = _model()
    cache = qwen2.init_cache(cfg, 2, 16, kv_bits=8)
    assert set(cache) == {"k8", "kscale", "v8", "vscale"}
    assert cache["k8"].shape == (2, 2, 16, 2, 8)       # [L,B,T,nkv,hd]
    assert cache["kscale"].shape == (2, 2, 16, 2)      # [L,B,T,nkv]
    assert cache["k8"].dtype == jnp.int8
    assert qwen2.cache_leaf_keys(cache) == (
        "k8", "kscale", "v8", "vscale"
    )
    with pytest.raises(ValueError):
        qwen2.init_cache(cfg, 2, 16, kv_bits=4)


def test_cached_forward_q8_close_to_fp():
    """Prefill + 1-token steps through an int8 cache stay close to the
    uncached full forward (the cache is the only approximation)."""
    cfg, params = _model()
    rng = np.random.default_rng(1)
    b, s, extra = 2, 6, 3
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, s + extra)))
    emb = qwen2.embed(params, ids)

    # ground truth: full uncached forward
    want, _ = qwen2.forward(params, cfg, emb, use_flash=False)

    cap = s + extra
    for kv_bits, atol in ((16, 1e-5), (8, 0.05)):
        cache = qwen2.init_cache(cfg, b, cap, dtype=jnp.float32,
                                 kv_bits=kv_bits)
        mask = jnp.zeros((b, cap), bool).at[:, :s].set(True)
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
        h, cache = qwen2.forward(
            params, cfg, emb[:, :s], attention_mask=mask,
            position_ids=pos, cache=cache, cache_index=0,
        )
        outs = [h]
        for t in range(extra):
            mask = mask.at[:, s + t].set(True)
            h, cache = qwen2.forward(
                params, cfg, emb[:, s + t: s + t + 1],
                attention_mask=mask,
                position_ids=jnp.full((b, 1), s + t, jnp.int32),
                cache=cache, cache_index=s + t,
            )
            outs.append(h)
        got = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=atol, rtol=0.05,
            err_msg=f"kv_bits={kv_bits}",
        )


def _requests(cfg, params, n=5):
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        s = int(rng.integers(4, PREFILL + 1))
        ids = rng.integers(0, cfg.vocab_size, size=(1, s))
        emb = qwen2.embed(params, jnp.asarray(ids))
        mask = jnp.ones((1, s), bool)
        pos = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0, None)
        out.append((f"utt{i}", SimpleNamespace(
            embeds=emb, attention_mask=mask, position_ids=pos,
        )))
    return out


def test_pool_q8_matches_static_q8_greedy():
    """Both paths quantize identically at write time, so the pool under
    kv_bits=8 is still bit-identical to static greedy under kv_bits=8."""
    from ps_slm_tpu.inference.continuous import (
        ContinuousGreedyDecoder, _left_pad_merged,
    )
    from ps_slm_tpu.inference.generate import greedy_generate

    cfg, llm = _model()
    reqs = _requests(cfg, llm)

    expected = {}
    for key, merged in reqs:
        emb, mask, pos = _left_pad_merged(merged, PREFILL)
        toks = np.asarray(greedy_generate(
            llm, cfg, emb, mask, pos,
            max_new_tokens=MAX_NEW, eos_token_id=EOS, kv_bits=8,
        ))[0]
        cut = np.where(toks == EOS)[0]
        expected[key] = toks[: cut[0]] if len(cut) else toks

    model = SimpleNamespace(llm_cfg=cfg)
    merged_by_key = dict(reqs)
    model._merged_jit = lambda params, batch: merged_by_key[batch["key"]]

    dec = ContinuousGreedyDecoder(
        model, {"llm": llm}, num_slots=2, prefill_len=PREFILL,
        max_new_tokens=MAX_NEW, eos_token_id=EOS, sync_every=3, kv_bits=8,
    )
    got = dict(dec.run((k, {"key": k}) for k, _ in reqs))

    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k]), k


def test_beam_q8_runs_and_matches_fp_shapes():
    """Beam under kv_bits=8: the quantized cache rides the decode-region
    reorder; output shape/validity as the fp path."""
    from ps_slm_tpu.inference.generate import beam_generate

    cfg, llm = _model()
    rng = np.random.default_rng(5)
    b, s = 2, PREFILL
    ids = rng.integers(0, cfg.vocab_size, size=(b, s))
    emb = qwen2.embed(llm, jnp.asarray(ids))
    mask = jnp.ones((b, s), bool)
    pos = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0, None)
    out8 = np.asarray(beam_generate(
        llm, cfg, emb, mask, pos, max_new_tokens=MAX_NEW,
        eos_token_id=EOS, num_beams=3, kv_bits=8,
    ))
    assert out8.shape == (b, MAX_NEW)
    assert ((out8 >= 0) & (out8 < cfg.vocab_size)).all()
