"""tools/asset_day.py: the one-command asset-day rehearsal works end to end.

VERDICT r3 item 8: when the released assets (SenseVoiceSmall funasr dir,
Qwen2.5 HF dir, text_only / half_audio_finetuned pytorch_model.bin,
readme.md:65-66) are mounted, ``ps-slm-assets --assets <dir>`` must produce
every BASELINE quality row unattended.  This test runs the IDENTICAL code
path on synthetic stand-ins fabricated in the exact asset layout
(--dry-run), asserting goldens PASS and both recipe rows are produced.
"""

import json
import os

import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # builds fixtures + 2 full decode pipelines

from ps_slm_tpu.tools import asset_day  # noqa: E402


def test_dry_run_produces_every_quality_row(tmp_path):
    workdir = str(tmp_path / "day")
    rc = asset_day.main([
        "--dry-run", "--workdir", workdir,
        "--decode-arg", "++train_config.max_new_tokens=12",
        "--decode-arg", "++dataset_config.eval_max_frame_length=96",
        "--decode-arg", "++dataset_config.prompt_style={} <speech> ",
    ])
    assert rc == 0
    with open(os.path.join(workdir, "BASELINE_QUALITY.json")) as f:
        out = json.load(f)
    # converter goldens vs the reference torch modules must be bit-close
    assert out["goldens"] == "PASS"
    # one decode->clean->WER row per (recipe ckpt, test set)
    assert {r["recipe"] for r in out["rows"]} == set(asset_day.RECIPES)
    for row in out["rows"]:
        assert row["n_ref_tokens"] > 0
        # per-pair artifacts: pred/gt/wer files on disk
        prefix = os.path.join(
            workdir, f"{row['recipe']}_{row['test_set']}", "test"
        )
        for suffix in ("_pred", "_gt", "_wer"):
            assert os.path.exists(prefix + suffix), prefix + suffix
