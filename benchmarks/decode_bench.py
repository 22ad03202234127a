"""Decode throughput benchmark: tokens/sec + RTF at 1.5B (BASELINE.md row 2).

Measures the full TASU batch-decode path (audio -> encoder -> posterior ->
PSD -> projector -> merge -> KV-cache decode) on synthetic audio at the
reference decode settings (greedy and beam-4, max_new_tokens bounded).

Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.inference.generate import generate
    from ps_slm_tpu.models.tasu import model_factory

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        llm_over = dict(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12,
            num_key_value_heads=2, head_dim=128, rope_theta=1e6,
        )
        enc_over = dict(
            input_size=560, output_size=512, attention_heads=4,
            linear_units=2048, num_blocks=50, tp_blocks=20, kernel_size=11,
            vocab_size=25055,
        )
        batch, frames, max_new = 8, 256, 32
    else:
        llm_over = dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
        )
        enc_over = dict(
            input_size=80, output_size=32, attention_heads=2,
            linear_units=64, num_blocks=2, tp_blocks=1, kernel_size=5,
            vocab_size=64,
        )
        batch, frames, max_new = 2, 32, 8

    tc = TrainConfig(ctc_posterior=True, do_psd=True)
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=enc_over["vocab_size"], llm_dim=llm_over["hidden_size"],
        encoder_projector_ds_rate=1,
        llm_config_overrides=llm_over, encoder_config_overrides=enc_over,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0), dtype=dtype)
    model.speech_token_id = llm_over["vocab_size"] - 2

    rng = np.random.default_rng(0)
    s = 32
    ids = rng.integers(1, 1000 if on_tpu else 200, size=(batch, s)).astype(np.int32)
    ids[:, -1] = model.speech_token_id  # left-pad style: speech near the end
    mask = np.ones((batch, s), bool)
    mask[:, :4] = False
    jbatch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "input_features": jnp.asarray(
            rng.normal(size=(batch, frames, enc_over["input_size"])), dtype
        ),
        "input_feature_length": jnp.asarray(
            np.full((batch,), frames, np.int32)
        ),
    }
    eos = 0
    audio_sec = batch * frames * 0.060

    for beams in (1, 4):
        out = generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=beams, max_new_tokens=max_new,
        )
        _ = np.asarray(out)  # sync
        t0 = time.perf_counter()
        n_iter = 2
        for _ in range(n_iter):
            out = generate(
                model, model.params, jbatch, eos_token_id=eos,
                num_beams=beams, max_new_tokens=max_new,
            )
            _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n_iter
        tokens = int((np.asarray(out) != eos).sum()) + batch
        print(json.dumps({
            "metric": f"decode_beam{beams}",
            "tokens_per_sec": round(tokens / dt, 1),
            "audio_sec_per_sec": round(audio_sec / dt, 1),
            "rtf": round(dt / audio_sec, 4),
            "batch": batch, "frames": frames, "max_new_tokens": max_new,
        }))


if __name__ == "__main__":
    main()
