"""tools/goldens.py harness works end to end on a synthetic checkpoint.

When real released assets become reachable, the same commands verify
bit-level parity; this test locks the machinery (reference-module capture
-> converter load -> JAX verify) with a random-init checkpoint saved in the
funasr dir layout.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # imports the reference torch modules

from ps_slm_tpu.tools import goldens  # noqa: E402


def _synthetic_funasr_dir(tmp_path):
    ro = goldens._ref_oracle_module()
    sv = ro.load_ref_sensevoice()
    torch.manual_seed(0)
    enc = sv.SenseVoiceEncoderSmall(
        input_size=560, output_size=32, attention_heads=2,
        linear_units=48, num_blocks=3, tp_blocks=1, kernel_size=11,
    ).eval()
    state = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    state["ctc.ctc_lo.weight"] = torch.randn(25, 32)
    state["ctc.ctc_lo.bias"] = torch.randn(25)
    state["embed.weight"] = torch.randn(16, 560)  # query tokens (SenseVoice.py:640)
    d = tmp_path / "SenseVoiceSmall"
    d.mkdir()
    torch.save(state, d / "model.pt")
    (d / "config.yaml").write_text(
        "input_size: 560\n"
        "vocab_size: 25\n"
        "encoder_conf:\n"
        "    output_size: 32\n"
        "    attention_heads: 2\n"
        "    linear_units: 48\n"
        "    num_blocks: 3\n"
        "    tp_blocks: 1\n"
        "    kernel_size: 11\n"
    )
    return str(d)


def test_capture_then_verify_passes(tmp_path):
    enc_dir = _synthetic_funasr_dir(tmp_path)
    npz = str(tmp_path / "golden.npz")
    assert goldens.capture(npz, encoder_dir=enc_dir) == 0
    g = np.load(npz)
    assert "enc_hidden" in g and "ctc_logits" in g
    assert goldens.verify(npz, encoder_dir=enc_dir) == 0


def test_verify_fails_on_wrong_weights(tmp_path):
    enc_dir = _synthetic_funasr_dir(tmp_path)
    npz = str(tmp_path / "golden.npz")
    assert goldens.capture(npz, encoder_dir=enc_dir) == 0
    # corrupt the checkpoint -> verify must FAIL, proving sensitivity
    # (random noise, not a constant: a uniform shift of a post-LayerNorm
    # projection is invisible because LN outputs are zero-mean)
    p = os.path.join(enc_dir, "model.pt")
    state = torch.load(p, weights_only=False)
    key = "encoder.encoders0.0.self_attn.linear_q_k_v.weight"
    torch.manual_seed(3)
    state[key] = state[key] + 0.05 * torch.randn_like(state[key])
    torch.save(state, p)
    assert goldens.verify(npz, encoder_dir=enc_dir) != 0
