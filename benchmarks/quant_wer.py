"""Quantization QUALITY canary: WER of trained checkpoints under every
decode quantization config.

docs/PERF.md's decode tables measure tokens/s for int8/int4 weights and the
int8 KV cache on random-init weights; this benchmark supplies the missing
half of each claim — the WER delta — by decoding the two TRAINED canary
checkpoints under each config through the real ``cli/decode.py``:

* the closed-loop multitask checkpoint (``benchmarks/closed_loop.py``,
  beam-4 decode — its committed baseline is
  ``benchmarks/closed_loop_wer_tpu.json``), and
* the TASU-transfer checkpoint (``benchmarks/tasu_transfer.py``, text-only
  trained projector decoding real audio with PSD).

Configs: fp32 (as-trained baseline), bf16, int8 / int4 weight-only
(``train_config.quantization`` — the generalization of the reference's
``load_in_8bit`` path, ps-slm.py:92-103), int8 KV cache
(``kv_cache_bits=8``), and int8+kv8 combined.  The checkpoint import
re-quantizes imported fp32 weights with the factory's scheme
(training/checkpoint.py::import_reference_checkpoint), so this also
exercises the trained-weights quantization path end to end.

Usage (expects already-trained workdirs; see --help):
    python benchmarks/quant_wer.py --loop-workdir=/tmp/cl_psd15_tpu \
        --transfer-workdir=/tmp/ps_transfer_tpu
"""

from __future__ import annotations

import glob
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUANT_CONFIGS = {
    "fp32": [],
    "bf16": ["++train_config.mixed_precision=true"],
    "int8": [
        "++train_config.mixed_precision=true",
        "++train_config.quantization=true",
        "++train_config.quant_bits=8",
    ],
    "int4": [
        "++train_config.mixed_precision=true",
        "++train_config.quantization=true",
        "++train_config.quant_bits=4",
    ],
    "kv8": [
        "++train_config.mixed_precision=true",
        "++train_config.kv_cache_bits=8",
    ],
    "int8+kv8": [
        "++train_config.mixed_precision=true",
        "++train_config.quantization=true",
        "++train_config.quant_bits=8",
        "++train_config.kv_cache_bits=8",
    ],
}


def _latest_ckpt(out_dir: str) -> str:
    ckpts = sorted(
        glob.glob(os.path.join(out_dir, "step_*")),
        key=lambda p: int(p.rsplit("_", 1)[1]),
    )
    assert ckpts, f"no checkpoint under {out_dir}"
    return os.path.join(ckpts[-1], "pytorch_model.bin")


def _score(decode_log: str) -> dict:
    from ps_slm_tpu.tools.clean_marks import clean_file
    from ps_slm_tpu.tools.wer import score_files

    clean_file(decode_log + "_pred")
    clean_file(decode_log + "_gt")
    return score_files(
        decode_log + "_gt", decode_log + "_pred",
        char=True, verbose=False, stream=io.StringIO(),
    )


def _decode_and_score(base_args, workdir, name, config_name, extra) -> dict:
    from ps_slm_tpu.cli.decode import main as decode_main

    decode_log = os.path.join(
        workdir, "quant_decode", config_name.replace("+", "_"), "test"
    )
    t0 = time.perf_counter()
    rc = decode_main(base_args + extra + [f"decode_log={decode_log}"])
    wall = time.perf_counter() - t0
    assert rc == 0, f"{name}/{config_name} decode failed"
    s = _score(decode_log)
    return {
        "wer": round(s["wer"], 3),
        "n_ref_tokens": s["all"],
        # wall time incl. jit compile on the TINY canary model — a sanity
        # column only; the 1.5B tokens/s rows live in decode_bench.py
        "decode_wall_s": round(wall, 1),
    }


def closed_loop_rows(workdir: str) -> dict:
    """Quant WER over the trained closed-loop checkpoint, decoded with its
    own recipe (beam 4, PSD per the saved closed_loop_config.json)."""
    from benchmarks.closed_loop import _args

    with open(os.path.join(workdir, "closed_loop_config.json")) as f:
        loop_cfg = json.load(f)
    llm_path = os.path.join(workdir, "tiny_llm")
    out_dir = os.path.join(workdir, "out")
    ckpt = _latest_ckpt(out_dir)
    base = _args(
        workdir, llm_path, out_dir, [f"ckpt_path={ckpt}"],
        enc_vocab=loop_cfg["enc_vocab"],
        do_psd=loop_cfg.get("do_psd", False),
    )
    return _all_configs(base, workdir, "closed_loop")


def transfer_rows(workdir: str) -> dict:
    """Quant WER over the TASU-transfer checkpoint (stage-C decode: real
    audio -> real CTC posterior -> PSD -> text-only-trained projector)."""
    from benchmarks.tasu_transfer import _mc_args
    from ps_slm_tpu.data.spm import SenseVoiceTokenizer

    llm_path = os.path.join(workdir, "tiny_llm")
    bpe_dir = os.path.join(workdir, "enc_bpe")
    enc_vocab = SenseVoiceTokenizer(bpe_dir).vocab_size
    ckpt = os.path.join(workdir, "transfer_model.bin")
    base = _mc_args(workdir, llm_path, enc_vocab, bpe_dir) + [
        "++train_config.ctc_posterior=true",
        "++train_config.gt_emb=false",
        "++train_config.do_psd=true",
        f"ckpt_path={ckpt}",
    ]
    return _all_configs(base, workdir, "transfer")


def _all_configs(base, workdir, name) -> dict:
    rows = {}
    for cfg_name, extra in QUANT_CONFIGS.items():
        try:
            rows[cfg_name] = _decode_and_score(
                base, workdir, name, cfg_name, extra
            )
        except Exception as e:  # noqa: BLE001 — one config must not kill the sweep
            rows[cfg_name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"ckpt": name, "config": cfg_name,
                          **rows[cfg_name]}), flush=True)
    return rows


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    loop_workdir = "/tmp/cl_psd15_tpu"
    transfer_workdir = "/tmp/ps_transfer_tpu"
    out_path = None
    for a in argv:
        if a.startswith("--loop-workdir="):
            loop_workdir = a.split("=", 1)[1]
        elif a.startswith("--transfer-workdir="):
            transfer_workdir = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a == "--platform" or a == "cpu":
            continue
    if "--platform" in argv and "cpu" in argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    result = {"metric": "quant_wer", "ckpts": {}}
    if os.path.isdir(loop_workdir):
        result["ckpts"]["closed_loop"] = closed_loop_rows(loop_workdir)
    if os.path.isdir(os.path.join(transfer_workdir, "enc_bpe")):
        result["ckpts"]["transfer"] = transfer_rows(transfer_workdir)
    for rows in result["ckpts"].values():
        base = rows.get("fp32", {}).get("wer")
        if base is None:
            continue
        for cfg_name, row in rows.items():
            if "wer" in row:
                row["wer_delta_vs_fp32"] = round(row["wer"] - base, 3)
    print(json.dumps(result), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
