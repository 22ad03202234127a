"""Step-time anatomy: per-stage timings of the audio-TASU train step.

Reproduces the docs/PERF.md "step anatomy" table on demand — encoder(+CTC
posterior), full front half (enc -> PSD -> projector -> merge), full
forward (adds LLM + gathered CE), and the complete train step (adds
backward + optimizer).  Timings use device->host scalar pulls (the only
true sync on the axon relay backend).

Prints one JSON line.  Runs the reference-scale config on TPU; a tiny
config on CPU so the harness itself stays testable.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jax_leaves_sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax_leaves_sum(out))
    return (time.perf_counter() - t0) / iters * 1000.0


def jax_leaves_sum(out):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return jnp.sum(leaf.astype(jnp.float32))


def main():
    import jax
    import jax.numpy as jnp

    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models import tasu
    from ps_slm_tpu.models.tasu import (
        forward, model_factory, prepare_merged, trainable_mask,
    )
    from ps_slm_tpu.parallel import mesh as meshlib
    from ps_slm_tpu.training.step import make_train_step
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )

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
        batch, frames, text = 5, 512, 32
    else:
        llm_over = dict(
            vocab_size=1024, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=32,
        )
        enc_over = dict(
            input_size=80, output_size=64, attention_heads=2,
            linear_units=128, num_blocks=2, tp_blocks=1, kernel_size=11,
            vocab_size=256,
        )
        batch, frames, text = 2, 64, 16

    tc = TrainConfig(
        ctc_posterior=True, do_psd=True, freeze_llm=True,
        freeze_encoder=True, remat=False,
    )
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=enc_over["vocab_size"], llm_dim=llm_over["hidden_size"],
        encoder_projector_ds_rate=1,
        llm_config_overrides=llm_over, encoder_config_overrides=enc_over,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0), dtype=dtype)
    model.speech_token_id = llm_over["vocab_size"] - 2

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 1000, size=(batch, text)).astype(np.int32)
    ids[:, 3] = model.speech_token_id
    labels = ids.copy()
    labels[:, :8] = -100
    b = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((batch, text), bool),
        "labels": jnp.asarray(labels),
        "input_features": jnp.asarray(
            rng.normal(size=(batch, frames, enc_over["input_size"])), dtype
        ),
        "input_feature_length": jnp.full((batch,), frames, jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    enc = jax.jit(lambda p, f, fl: tasu.encode_speech(
        p, model.enc_cfg, f, fl, use_flash=model.use_flash,
    )[1].astype(jnp.float32))
    front = jax.jit(
        lambda p, bb: prepare_merged(model, p, bb, key, left_padding=False)
        .embeds
    )
    fwd = jax.jit(lambda p, bb: forward(model, p, bb, key)[0])

    params = model.params
    stages = {
        "encoder_posterior_ms": _time(
            enc, params, b["input_features"], b["input_feature_length"]
        ),
        "front_half_ms": _time(front, params, b),
        "full_forward_ms": _time(fwd, params, b),
    }

    mesh = meshlib.build_mesh(None)
    model.params = meshlib.shard_params(model.params, mesh)
    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)
    step = make_train_step(model, tx, trainable)
    gb = meshlib.shard_batch(b, mesh)
    # warm TWO steps: the donated output state's layout differs from the
    # freshly-created one, so the second call recompiles once (bench.py
    # does the same)
    for _ in range(2):
        state, m = step(state, gb, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, gb, key)
    _ = float(m["loss"])
    stages["train_step_ms"] = (time.perf_counter() - t0) / 10 * 1000.0
    stages["backward_opt_ms"] = (
        stages["train_step_ms"] - stages["full_forward_ms"]
    )

    print(json.dumps({
        "metric": "step_anatomy",
        **{k: round(v, 2) for k, v in stages.items()},
        "batch": batch, "frames": frames,
    }))


if __name__ == "__main__":
    main()
