"""SenseVoice standalone: training loss decreases; inference shape/timestamps."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ps_slm_tpu.models import sensevoice as sv
import pytest

from ps_slm_tpu.models.sensevoice_asr import (
    encoder_train_loss, inference, rich_ce_loss,
)

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)


class _TinyTok:
    def decode(self, ids):
        return "".join(chr(ord("a") + int(i) % 26) for i in ids if int(i) != 0)


def test_rich_ce_loss_basics():
    logits = jnp.asarray(np.eye(5, dtype=np.float32)[None, :4] * 10)
    labels = jnp.asarray([[0, 1, 2, 3]])
    low = float(rich_ce_loss(logits, labels))
    wrong = jnp.asarray([[4, 4, 4, 4]])
    high = float(rich_ce_loss(logits, wrong))
    assert low < 0.1 < high


def test_encoder_training_loss_decreases():
    cfg = sv.SenseVoiceConfig.tiny()
    params = sv.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t, l = 2, 18, 4
    speech = jnp.asarray(rng.normal(size=(b, t, cfg.input_size)).astype(np.float32))
    slens = jnp.asarray([t, t - 3])
    text = jnp.asarray(
        np.concatenate(
            [rng.integers(1, 5, size=(b, 4)),            # rich labels
             rng.integers(1, cfg.vocab_size, size=(b, l))], axis=1
        ).astype(np.int32)
    )
    tlens = jnp.asarray([4 + l, 4 + l - 1])

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            out = encoder_train_loss(p, cfg, speech, slens, text, tlens)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, out

    losses = []
    for _ in range(15):
        params, opt, out = step(params, opt)
        losses.append(float(out["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_inference_smoke_and_timestamps():
    cfg = sv.SenseVoiceConfig.tiny()
    params = sv.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    b, t = 2, 24
    speech = jnp.asarray(rng.normal(size=(b, t, cfg.input_size)).astype(np.float32))
    lens = jnp.asarray([t, t - 5])
    res = inference(
        params, cfg, _TinyTok(), speech, lens,
        language="en", use_itn=False, output_timestamp=True,
        keys=["a", "b"],
    )
    assert [r["key"] for r in res] == ["a", "b"]
    for r in res:
        assert isinstance(r["text"], str)
        for tok, left, right in r["timestamp"]:
            assert 0 <= left <= right
