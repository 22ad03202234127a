"""SenseVoice SANM encoder vs an independent torch oracle.

The oracle re-implements the published SANM layer equations
(SCAMA/FunASR: QKV projection, per-head scaled dot attention with padding
mask, depthwise FSMN conv memory branch over V with inner residual, pre-norm
residual blocks, 1-based sinusoidal PE) directly with torch primitives, then
we import its weights through the funasr-key converter and require the JAX
stack to match.
"""

import math

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ps_slm_tpu.models import sensevoice as sv  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)


def _torch_pe(t, depth):
    positions = torch.arange(1, t + 1, dtype=torch.float32)
    inc = math.log(10000.0) / (depth / 2 - 1)
    inv = torch.exp(torch.arange(depth // 2, dtype=torch.float32) * -inc)
    scaled = positions[:, None] * inv[None, :]
    return torch.cat([torch.sin(scaled), torch.cos(scaled)], dim=-1)


def _torch_layer(x, w, mask, heads, in_size, size):
    def ln(x, weight, bias):
        return F.layer_norm(x, (x.shape[-1],), weight, bias, 1e-5)

    residual = x
    y = ln(x, w["norm1.weight"], w["norm1.bias"])
    qkv = y @ w["self_attn.linear_q_k_v.weight"].T + w["self_attn.linear_q_k_v.bias"]
    q, k, v = torch.split(qkv, size, dim=-1)

    # FSMN branch on v
    m = mask[..., None].float()
    vm = v * m
    pad = (w["self_attn.fsmn_block.weight"].shape[-1] - 1) // 2
    conv_in = vm.transpose(1, 2)
    conv = F.conv1d(
        F.pad(conv_in, (pad, pad)), w["self_attn.fsmn_block.weight"],
        groups=size,
    ).transpose(1, 2)
    fsmn = (conv + vm) * m

    b, t, _ = q.shape
    hd = size // heads
    qh = q.view(b, t, heads, hd).transpose(1, 2) * hd ** -0.5
    kh = k.view(b, t, heads, hd).transpose(1, 2)
    vh = v.view(b, t, heads, hd).transpose(1, 2)
    scores = qh @ kh.transpose(-2, -1)
    scores = scores.masked_fill(~mask[:, None, None, :], float("-inf"))
    attn = torch.softmax(scores, dim=-1)
    attn = attn.masked_fill(~mask[:, None, None, :], 0.0)
    out = (attn @ vh).transpose(1, 2).reshape(b, t, size)
    out = out @ w["self_attn.linear_out.weight"].T + w["self_attn.linear_out.bias"]
    att = out + fsmn
    x = att if in_size != size else residual + att

    residual = x
    y = ln(x, w["norm2.weight"], w["norm2.bias"])
    y = torch.relu(y @ w["feed_forward.w_1.weight"].T + w["feed_forward.w_1.bias"])
    y = y @ w["feed_forward.w_2.weight"].T + w["feed_forward.w_2.bias"]
    return residual + y


def _rand_layer_weights(gen, in_size, size, linear_units, kernel):
    def t(*shape):
        return torch.randn(*shape, generator=gen) * 0.05

    return {
        "norm1.weight": 1.0 + 0.1 * t(in_size),
        "norm1.bias": 0.1 * t(in_size),
        "norm2.weight": 1.0 + 0.1 * t(size),
        "norm2.bias": 0.1 * t(size),
        "self_attn.linear_q_k_v.weight": t(size * 3, in_size),
        "self_attn.linear_q_k_v.bias": t(size * 3),
        "self_attn.linear_out.weight": t(size, size),
        "self_attn.linear_out.bias": t(size),
        "self_attn.fsmn_block.weight": t(size, 1, kernel),
        "feed_forward.w_1.weight": t(linear_units, in_size if False else size),
        "feed_forward.w_1.bias": t(linear_units),
        "feed_forward.w_2.weight": t(size, linear_units),
        "feed_forward.w_2.bias": t(size),
    }


def test_encoder_parity():
    cfg = sv.SenseVoiceConfig.tiny()
    gen = torch.Generator().manual_seed(0)
    d, ins = cfg.output_size, cfg.input_size

    state = {}
    w0 = _rand_layer_weights(gen, ins, d, cfg.linear_units, cfg.kernel_size)
    # encoders0 qkv maps from input_size
    w0["self_attn.linear_q_k_v.weight"] = torch.randn(
        d * 3, ins, generator=gen
    ) * 0.05
    w0["norm1.weight"] = 1.0 + 0.1 * torch.randn(ins, generator=gen)
    w0["norm1.bias"] = 0.1 * torch.randn(ins, generator=gen)
    for k, v in w0.items():
        state[f"encoder.encoders0.0.{k}"] = v
    layer_ws = []
    for i in range(cfg.num_blocks - 1):
        w = _rand_layer_weights(gen, d, d, cfg.linear_units, cfg.kernel_size)
        layer_ws.append(w)
        for k, v in w.items():
            state[f"encoder.encoders.{i}.{k}"] = v
    tp_ws = []
    for i in range(cfg.tp_blocks):
        w = _rand_layer_weights(gen, d, d, cfg.linear_units, cfg.kernel_size)
        tp_ws.append(w)
        for k, v in w.items():
            state[f"encoder.tp_encoders.{i}.{k}"] = v
    state["encoder.after_norm.weight"] = 1.0 + 0.1 * torch.randn(d, generator=gen)
    state["encoder.after_norm.bias"] = 0.1 * torch.randn(d, generator=gen)
    state["encoder.tp_norm.weight"] = 1.0 + 0.1 * torch.randn(d, generator=gen)
    state["encoder.tp_norm.bias"] = 0.1 * torch.randn(d, generator=gen)
    state["ctc.ctc_lo.weight"] = torch.randn(cfg.vocab_size, d, generator=gen) * 0.05
    state["ctc.ctc_lo.bias"] = torch.randn(cfg.vocab_size, generator=gen) * 0.05
    state["embed.weight"] = torch.randn(cfg.n_query_embed, ins, generator=gen)

    # ---- torch oracle forward ----
    b, t = 2, 18
    x = torch.randn(b, t, ins, generator=gen)
    lens = torch.tensor([18, 11])
    mask = torch.arange(t)[None, :] < lens[:, None]

    with torch.no_grad():
        y = x * d ** 0.5
        y = y + _torch_pe(t, ins)[None]
        y = _torch_layer(y, w0, mask, cfg.attention_heads, ins, d)
        for w in layer_ws:
            y = _torch_layer(y, w, mask, cfg.attention_heads, d, d)
        y = F.layer_norm(
            y, (d,), state["encoder.after_norm.weight"],
            state["encoder.after_norm.bias"], 1e-5,
        )
        for w in tp_ws:
            y = _torch_layer(y, w, mask, cfg.attention_heads, d, d)
        y = F.layer_norm(
            y, (d,), state["encoder.tp_norm.weight"],
            state["encoder.tp_norm.bias"], 1e-5,
        )
        logits_ref = y @ state["ctc.ctc_lo.weight"].T + state["ctc.ctc_lo.bias"]

    # ---- JAX forward via funasr-key import ----
    np_state = {k: v.numpy() for k, v in state.items()}
    params = sv.funasr_tensors_to_params(np_state, cfg, dtype=jnp.float32)
    hidden, out_lens = sv.encode(
        params, cfg, jnp.asarray(x.numpy()), jnp.asarray(lens.numpy()),
        use_flash=False,
    )
    logits = sv.ctc_logits(params, hidden)

    valid = mask.numpy().astype(bool)
    np.testing.assert_allclose(
        np.asarray(hidden)[valid], y.numpy()[valid], atol=3e-5, rtol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(logits)[valid], logits_ref.numpy()[valid], atol=3e-4, rtol=3e-4
    )
    np.testing.assert_array_equal(np.asarray(out_lens), lens.numpy())


def test_query_embedding_shape():
    cfg = sv.SenseVoiceConfig.tiny()
    import jax

    params = sv.init_params(jax.random.PRNGKey(0), cfg)
    q = sv.query_embedding(params, [[0], [1, 2], [2]][1])
    assert q.shape == (2, cfg.input_size)
