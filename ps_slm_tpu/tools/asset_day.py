"""One-command asset-day rehearsal: every BASELINE quality row, unattended.

The north-star BASELINE row (match WER with the released ``text_only`` /
``half_audio_finetuned`` checkpoints, ``/root/reference/readme.md:65-66``,
loaded at ``ps-slm.py:163-170``) is blocked on asset access in this
environment.  This tool is the single command to run the moment the assets
are mounted:

    ps-slm-assets --assets /assets --workdir /tmp/asset_day

It expects the layout::

    <assets>/SenseVoiceSmall/            funasr dir (model.pt, config.yaml,
                                         chn_jpn_yue_eng_ko_spectok.bpe.model)
    <assets>/Qwen2.5-1.5B-Instruct/      HF dir
    <assets>/text_only/pytorch_model.bin           released TASU ckpts
    <assets>/half_audio_finetuned/pytorch_model.bin
    <assets>/test_sets/<name>/multitask.jsonl      eval manifests
    <assets>/multiprompt.jsonl

and produces, unattended:

  1. activation goldens vs the reference torch modules
     (tools/goldens.py capture+verify) for the encoder and LLM converters,
  2. for every (checkpoint, test set): the full reference decode pipeline —
     ``cli/decode`` with the ``decode_sensevoice.sh:60-97`` knobs
     (ctc_posterior=true, do_psd=true, beam 4) -> ``clean_marks`` ->
     ``tools/wer --char=1`` — i.e. every BASELINE quality row,
  3. ``<workdir>/BASELINE_QUALITY.json`` with one row per pair.

``--dry-run`` fabricates synthetic stand-ins in the same layout (tiny
funasr encoder dir, tiny HF Qwen2 dir, random TASU ckpt, closed-loop tone
corpus) and runs the IDENTICAL code path, proving the plumbing end to end
without the assets.  WER on random weights is meaningless; the artifact is
that every stage runs and every row is produced.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys

import numpy as np

RECIPES = ("text_only", "half_audio_finetuned")


def _llm_dim(llm_dir: str) -> int:
    with open(os.path.join(llm_dir, "config.json")) as f:
        return int(json.load(f)["hidden_size"])


def _encoder_vocab(enc_dir: str) -> int:
    from ps_slm_tpu.training.checkpoint import _parse_encoder_yaml

    return int(
        _parse_encoder_yaml(os.path.join(enc_dir, "config.yaml"))["vocab_size"]
    )


def decode_and_score(
    enc_dir: str, llm_dir: str, ckpt: str, test_dir: str, prompt_path: str,
    out_prefix: str, *, extra_args=(), log=print,
) -> dict:
    """cli/decode with the reference decode knobs -> clean_marks -> wer.

    Mirrors ``decode_sensevoice.sh:60-97`` (ctc_posterior/do_psd/beam-4
    through inference_batch.py, then clean_marks + wenet_compute_cer)."""
    from ps_slm_tpu.cli.decode import main as decode_main
    from ps_slm_tpu.tools.clean_marks import clean_file
    from ps_slm_tpu.tools.wer import score_files

    os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
    rc = decode_main([
        f"++model_config.llm_path={llm_dir}",
        f"++model_config.llm_dim={_llm_dim(llm_dir)}",
        f"++model_config.encoder_path={enc_dir}",
        f"++model_config.encoder_dim={_encoder_vocab(enc_dir)}",
        "++model_config.encoder_projector=linear-silu",
        "++model_config.encoder_projector_ds_rate=1",
        "++train_config.ctc_posterior=true",
        "++train_config.do_psd=true",
        "++train_config.gt_emb=false",
        f"++dataset_config.test_scp_file_path={test_dir}",
        f"++dataset_config.multitask_prompt_path={prompt_path}",
        f"ckpt_path={ckpt}",
        f"decode_log={out_prefix}",
    ] + list(extra_args))
    if rc != 0:
        raise RuntimeError(f"decode failed rc={rc} for {ckpt} x {test_dir}")
    clean_file(out_prefix + "_pred")
    clean_file(out_prefix + "_gt")
    buf = io.StringIO()
    result = score_files(
        out_prefix + "_gt", out_prefix + "_pred",
        char=True, verbose=True, stream=buf,
    )
    with open(out_prefix + "_wer", "w") as f:
        f.write(buf.getvalue())
    log(f"  {out_prefix}: WER {result['wer']:.2f}% (N={result['all']})")
    return result


def run_all(assets: str, workdir: str, *, extra_args=(), log=print) -> dict:
    from ps_slm_tpu.tools import goldens

    os.makedirs(workdir, exist_ok=True)
    enc_dir = os.path.join(assets, "SenseVoiceSmall")
    llm_dir = os.path.join(assets, "Qwen2.5-1.5B-Instruct")
    prompt_path = os.path.join(assets, "multiprompt.jsonl")
    out: dict = {"assets": assets, "goldens": None, "rows": []}

    # 1. activation goldens (converter bit-parity vs the reference modules)
    have_enc = os.path.isdir(enc_dir)
    have_llm = os.path.isdir(llm_dir)
    if have_enc or have_llm:
        npz = os.path.join(workdir, "goldens.npz")
        log("== goldens: capture (reference torch modules) ==")
        goldens.capture(
            npz, encoder_dir=enc_dir if have_enc else None,
            llm_dir=llm_dir if have_llm else None,
        )
        log("== goldens: verify (JAX converters) ==")
        rc = goldens.verify(
            npz, encoder_dir=enc_dir if have_enc else None,
            llm_dir=llm_dir if have_llm else None,
        )
        out["goldens"] = "PASS" if rc == 0 else "FAIL"

    # 2. decode + WER for every (recipe ckpt, test set)
    ts_root = os.path.join(assets, "test_sets")
    test_sets = sorted(
        d for d in (os.listdir(ts_root) if os.path.isdir(ts_root) else [])
        if os.path.exists(os.path.join(ts_root, d, "multitask.jsonl"))
    )
    for recipe in RECIPES:
        ckpt = os.path.join(assets, recipe, "pytorch_model.bin")
        if not os.path.exists(ckpt):
            log(f"== {recipe}: no checkpoint, skipped ==")
            continue
        for ts in test_sets:
            log(f"== decode {recipe} x {ts} ==")
            r = decode_and_score(
                enc_dir, llm_dir, ckpt, os.path.join(ts_root, ts),
                prompt_path,
                os.path.join(workdir, f"{recipe}_{ts}", "test"),
                extra_args=extra_args, log=log,
            )
            out["rows"].append({
                "recipe": recipe, "test_set": ts,
                "wer": round(r["wer"], 2), "n_ref_tokens": r["all"],
            })

    path = os.path.join(workdir, "BASELINE_QUALITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    return out


# ----------------------------------------------------------------------------
# dry run: synthetic stand-ins in the exact asset layout
# ----------------------------------------------------------------------------

def _export_funasr_dir(path: str, enc_params, enc_cfg) -> None:
    """Write a funasr-layout SenseVoiceSmall dir (model.pt + config.yaml)
    from a params pytree — the inverse surface of
    ``training/checkpoint.load_funasr_encoder``."""
    import torch

    from ps_slm_tpu.training.checkpoint import _encoder_to_reference

    os.makedirs(path, exist_ok=True)
    ref = _encoder_to_reference(enc_params, enc_cfg)
    # funasr keys = reference-bin keys minus the composite "encoder." prefix
    state = {
        k[len("encoder."):]: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in ref.items()
    }
    torch.save(state, os.path.join(path, "model.pt"))
    with open(os.path.join(path, "config.yaml"), "w") as f:
        f.write(f"input_size: {enc_cfg.input_size}\n")
        f.write(f"vocab_size: {enc_cfg.vocab_size}\n")
        f.write("encoder_conf:\n")
        for k in ("output_size", "attention_heads", "linear_units",
                  "num_blocks", "tp_blocks", "kernel_size"):
            f.write(f"  {k}: {getattr(enc_cfg, k)}\n")


def build_dry_assets(assets: str, *, n_words=16, seed=0) -> None:
    """Fabricate the full asset layout from synthetic stand-ins."""
    import shutil

    import jax

    from benchmarks.closed_loop import build_fixtures, build_llm_fixture
    from benchmarks.tasu_transfer import build_encoder_bpe
    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models import sensevoice as sv
    from ps_slm_tpu.models.tasu import model_factory
    from ps_slm_tpu.training.checkpoint import export_reference_checkpoint

    os.makedirs(assets, exist_ok=True)
    scratch = os.path.join(assets, "_scratch")
    build_fixtures(scratch, n_train=8, n_dev=4, n_test=8, seed=seed,
                   n_words=n_words, noise_std=0.0, rate_var=0.0,
                   multitask=False)
    ts = os.path.join(assets, "test_sets", "synthetic")
    os.makedirs(ts, exist_ok=True)
    shutil.copy(os.path.join(scratch, "test", "multitask.jsonl"),
                os.path.join(ts, "multitask.jsonl"))
    shutil.copy(os.path.join(scratch, "multiprompt.jsonl"),
                os.path.join(assets, "multiprompt.jsonl"))

    # tiny HF LLM dir under the expected name
    llm_src = build_llm_fixture(scratch, n_words=n_words)
    llm_dst = os.path.join(assets, "Qwen2.5-1.5B-Instruct")
    if os.path.isdir(llm_dst):
        shutil.rmtree(llm_dst)
    shutil.copytree(llm_src, llm_dst)

    # tiny funasr SenseVoice dir (+ the word-atomic BPE model)
    enc_dir = os.path.join(assets, "SenseVoiceSmall")
    build_encoder_bpe(enc_dir, n_words)
    from ps_slm_tpu.data.spm import SenseVoiceTokenizer

    enc_vocab = SenseVoiceTokenizer(enc_dir).vocab_size
    enc_cfg = sv.SenseVoiceConfig.tiny(
        input_size=560, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=2, tp_blocks=0, vocab_size=enc_vocab,
    )
    enc_params = sv.init_params(jax.random.PRNGKey(seed), enc_cfg)
    _export_funasr_dir(enc_dir, enc_params, enc_cfg)

    # random-weight TASU checkpoints under the recipe names
    tc = TrainConfig(ctc_posterior=True, do_psd=True)
    mc = ModelConfig(
        llm_path=llm_dst, encoder_path=enc_dir,
        encoder_projector="linear-silu", encoder_dim=enc_vocab,
        llm_dim=_llm_dim(llm_dst), encoder_projector_ds_rate=1,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(seed))
    for recipe in RECIPES:
        d = os.path.join(assets, recipe)
        os.makedirs(d, exist_ok=True)
        export_reference_checkpoint(
            model, os.path.join(d, "pytorch_model.bin")
        )


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="asset-day rehearsal: goldens + every BASELINE "
        "quality row in one command",
    )
    ap.add_argument("--assets", default=os.environ.get("PS_ASSETS_DIR"))
    ap.add_argument("--workdir", default="/tmp/ps_asset_day")
    ap.add_argument(
        "--dry-run", action="store_true",
        help="fabricate synthetic stand-ins in the asset layout first",
    )
    ap.add_argument(
        "--decode-arg", action="append", default=[],
        help="extra ++overrides forwarded to every decode",
    )
    a = ap.parse_args(argv)
    assets = a.assets
    extra = list(a.decode_arg)
    if a.dry_run:
        assets = assets or os.path.join(a.workdir, "dry_assets")
        build_dry_assets(assets)
        # tiny stand-ins answer in a few tokens; cap the loop accordingly
        extra += [
            "++train_config.max_new_tokens=12",
            "++dataset_config.eval_max_frame_length=96",
            "++dataset_config.prompt_style={} <speech> ",
        ]
    if not assets:
        ap.error("--assets (or PS_ASSETS_DIR) required without --dry-run")
    out = run_all(assets, a.workdir, extra_args=extra)
    print(json.dumps({
        "metric": "asset_day",
        "goldens": out["goldens"],
        "rows": out["rows"],
        "dry_run": bool(a.dry_run),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
