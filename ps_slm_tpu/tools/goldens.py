"""Activation-golden capture / verify against real released checkpoints.

Round-1 verdict gap: the converters are round-trip- and oracle-parity-
tested, but bit-level parity against *released* weights (SenseVoiceSmall
funasr dir, Qwen2.5 HF dir, `text_only` / `half_audio_finetuned`
pytorch_model.bin — readme.md:65-66) is unverified because the assets are
unreachable in the build environment.  This tool is the ready-to-run
harness for the moment they are:

  capture   run the *reference torch modules* (imported from the reference
            source with funasr stubbed, tests/reference_oracle.py) on real
            weights + a deterministic fixture, save activations to npz
  verify    load the same weights through our converters, run the JAX
            modules on the same fixture, compare against the npz

Usage:
  python -m ps_slm_tpu.tools.goldens capture out.npz \
      --encoder-dir /path/SenseVoiceSmall [--llm-dir /path/Qwen2.5-1.5B]
  python -m ps_slm_tpu.tools.goldens verify out.npz \
      --encoder-dir /path/SenseVoiceSmall [--llm-dir /path/Qwen2.5-1.5B]

Fixture: seeded random 560-dim LFR features (the encoder contract input,
ps-slm.py:426) — front-end (fbank) parity is covered separately by
tests/test_fbank.py golden values, since funasr itself is not installed.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ATOL = 2e-4


def _fixture(batch=2, frames=64, dim=560, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(batch, frames, dim)).astype(np.float32)
    lens = np.asarray([frames, frames - 9], np.int32)
    return feats, lens


def _ref_oracle_module():
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "tests")
    )
    import reference_oracle

    return reference_oracle


def capture(out_path: str, encoder_dir: str = None, llm_dir: str = None):
    import torch

    goldens = {}
    feats, lens = _fixture()

    if encoder_dir:
        ro = _ref_oracle_module()
        sv = ro.load_ref_sensevoice()
        state = torch.load(
            os.path.join(encoder_dir, "model.pt"), map_location="cpu",
            weights_only=False,
        )
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        # build the reference encoder at checkpoint dims and load weights
        from ps_slm_tpu.training.checkpoint import _parse_encoder_yaml

        conf = _parse_encoder_yaml(os.path.join(encoder_dir, "config.yaml"))
        enc = sv.SenseVoiceEncoderSmall(
            input_size=int(conf.get("input_size", 560)),
            output_size=int(conf.get("output_size", 512)),
            attention_heads=int(conf.get("attention_heads", 4)),
            linear_units=int(conf.get("linear_units", 2048)),
            num_blocks=int(conf.get("num_blocks", 50)),
            tp_blocks=int(conf.get("tp_blocks", 20)),
            kernel_size=int(conf.get("kernel_size", 11)),
        ).eval()
        enc_state = {
            k[len("encoder."):]: v for k, v in state.items()
            if k.startswith("encoder.")
        }
        missing, unexpected = enc.load_state_dict(enc_state, strict=False)
        print(f"encoder load: {len(missing)} missing, {len(unexpected)} unexpected")
        with torch.no_grad():
            hid, out_lens = enc(
                torch.from_numpy(feats), torch.from_numpy(lens)
            )
        goldens["enc_hidden"] = hid.numpy()
        # CTC head
        w = state.get("ctc.ctc_lo.weight")
        if w is not None:
            logits = hid @ w.T + state["ctc.ctc_lo.bias"]
            goldens["ctc_logits"] = logits.numpy()

    if llm_dir:
        from transformers import AutoModelForCausalLM

        m = AutoModelForCausalLM.from_pretrained(
            llm_dir, torch_dtype=torch.float32
        ).eval()
        rng = np.random.default_rng(1)
        ids = rng.integers(0, m.config.vocab_size, size=(2, 16))
        with torch.no_grad():
            out = m(input_ids=torch.tensor(ids))
        goldens["llm_ids"] = ids
        goldens["llm_logits"] = out.logits.numpy()

    np.savez(out_path, **goldens)
    print(f"captured {sorted(goldens)} -> {out_path}")
    return 0


def verify(golden_path: str, encoder_dir: str = None, llm_dir: str = None):
    import jax
    import jax.numpy as jnp

    g = np.load(golden_path)
    feats, lens = _fixture()
    rc = 0
    # fp32 goldens demand fp32 matmuls: on TPU the default matmul precision
    # is bf16 passes (~1e-2 rel err), which would drown the 2e-4 parity bar
    with jax.default_matmul_precision("highest"):
        if encoder_dir and "enc_hidden" in g:
            from ps_slm_tpu.models import sensevoice as svj
            from ps_slm_tpu.training.checkpoint import load_funasr_encoder

            params, cfg = load_funasr_encoder(encoder_dir)
            hid, _ = svj.encode(
                params, cfg, jnp.asarray(feats), jnp.asarray(lens),
                use_flash=False,
            )
            # padded frames are unspecified output — compare valid only
            # (same methodology as tests/test_sensevoice_parity.py)
            valid = np.arange(feats.shape[1])[None, :] < lens[:, None]
            err = np.max(np.abs(np.asarray(hid) - g["enc_hidden"])[valid])
            print(f"encoder hidden max|err| = {err:.2e} (atol {ATOL})")
            rc |= int(err > ATOL)
            if "ctc_logits" in g:
                logits = svj.ctc_logits(params, hid)
                err = np.max(
                    np.abs(np.asarray(logits) - g["ctc_logits"])[valid]
                )
                print(f"ctc logits max|err| = {err:.2e}")
                rc |= int(err > 10 * ATOL)

        if llm_dir and "llm_logits" in g:
            from ps_slm_tpu.models import qwen2

            params, cfg = qwen2.load_hf_checkpoint(llm_dir, dtype=jnp.float32)
            ids = g["llm_ids"]
            emb = qwen2.embed(params, jnp.asarray(ids))
            hid, _ = qwen2.forward(
                params, cfg, emb,
                attention_mask=jnp.ones(ids.shape, bool), use_flash=False,
            )
            logits = np.asarray(qwen2.unembed(params, hid))
            err = np.max(np.abs(logits - g["llm_logits"]))
            print(f"llm logits max|err| = {err:.2e} (atol {10 * ATOL})")
            rc |= int(err > 10 * ATOL)

    print("PASS" if rc == 0 else "FAIL")
    return rc


def main(argv=None):
    """Asset-day one-liners (VERDICT r2 item 10) — with the released
    checkpoints mounted and their paths exported once:

        export PS_SENSEVOICE_DIR=/assets/SenseVoiceSmall
        export PS_QWEN_DIR=/assets/Qwen2.5-1.5B-Instruct
        python -m ps_slm_tpu.tools.goldens capture goldens.npz
        python -m ps_slm_tpu.tools.goldens verify  goldens.npz

    produce + check the encoder/LLM activation goldens; the WER row of
    BASELINE.md then comes from the standard decode pipeline with
    ``ckpt_path=$PS_TASU_CKPT/pytorch_model.bin`` (docs/PARITY.md)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=("capture", "verify"))
    ap.add_argument("npz")
    ap.add_argument(
        "--encoder-dir", default=os.environ.get("PS_SENSEVOICE_DIR"),
        help="SenseVoiceSmall funasr dir (env PS_SENSEVOICE_DIR)",
    )
    ap.add_argument(
        "--llm-dir", default=os.environ.get("PS_QWEN_DIR"),
        help="Qwen2.5 HF dir (env PS_QWEN_DIR)",
    )
    a = ap.parse_args(argv)
    fn = capture if a.mode == "capture" else verify
    return fn(a.npz, encoder_dir=a.encoder_dir, llm_dir=a.llm_dir)


if __name__ == "__main__":
    raise SystemExit(main())
