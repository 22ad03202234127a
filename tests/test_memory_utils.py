"""utils/memory.py + dataset fixed_batches — the last '— (thin)' rows of
docs/PARITY.md (VERDICT r2 item 9)."""

import numpy as np

import jax
import jax.numpy as jnp

from ps_slm_tpu.data.dataset import fixed_batches
from ps_slm_tpu.utils.memory import (
    MemoryTrace, device_memory_stats, host_rss_gb,
)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    n = len(jax.local_devices())
    assert len(stats) == 2 * n
    for i in range(n):
        assert f"device{i}_gb" in stats and f"device{i}_peak_gb" in stats
        assert stats[f"device{i}_gb"] >= 0.0
        assert stats[f"device{i}_peak_gb"] >= stats[f"device{i}_gb"] or (
            stats[f"device{i}_peak_gb"] == 0.0  # backend w/o stats
        )


def test_host_rss_positive():
    # psutil is available in this image; a real process has real RSS
    assert host_rss_gb() > 0.01


def test_memory_trace_reports():
    with MemoryTrace() as mem:
        x = jnp.ones((256, 256))
        _ = float((x @ x).sum())
    report = mem.report()
    assert "device used" in report and "host RSS" in report
    assert mem.cpu_rss_gb > 0.01
    assert mem.used_gb >= 0.0 and mem.peak_gb >= 0.0


def test_fixed_batches_sizes_and_remainder():
    samples = list(range(10))
    got = list(fixed_batches(iter(samples), 4))
    assert [len(b) for b in got] == [4, 4, 2]
    assert [s for b in got for s in b] == samples


def test_fixed_batches_exact_multiple_and_empty():
    assert [len(b) for b in fixed_batches(iter(range(8)), 4)] == [4, 4]
    assert list(fixed_batches(iter([]), 4)) == []


def test_fixed_batch_size_plumbs_through_dataset_factory(tmp_path):
    """batching_strategy='padding' end to end: the factory yields fixed
    val_batch_size batches (reference inference_batch.py:129-132)."""
    import json

    from ps_slm_tpu.config import DataConfig
    from ps_slm_tpu.data import audio_io
    from ps_slm_tpu.data.dataset import get_speech_dataset
    from ps_slm_tpu.data.tokenizer import StubTokenizer

    rng = np.random.default_rng(0)
    entries = {
        f"utt{i}": (16000, rng.normal(size=4000).astype(np.float32) * 0.1)
        for i in range(7)
    }
    ark = tmp_path / "wav.ark"
    offsets = audio_io.write_kaldi_wav_ark(str(ark), entries)
    d = tmp_path / "test"
    d.mkdir()
    with open(d / "multitask.jsonl", "w") as f:
        for i in range(7):
            f.write(json.dumps({
                "key": f"utt{i}", "path": f"{ark}:{offsets[f'utt{i}']}",
                "target": f"word{i}", "GT": f"word{i}", "task": "ASR",
            }) + "\n")
    prompt = tmp_path / "multiprompt.jsonl"
    prompt.write_text(
        json.dumps({"task": "ASR", "prompt": "transcribe:"}) + "\n"
    )

    dc = DataConfig(
        multitask_prompt_path=str(prompt), test_scp_file_path=str(d),
        eval_max_frame_length=300, feature_bucket=16, token_bucket=8,
    )
    batches = list(get_speech_dataset(
        dc, StubTokenizer(), "test", fixed_batch_size=3,
    ))
    sizes = [len(b["keys"]) for b in batches]
    assert sizes == [3, 3, 1]
    keys = [k for b in batches for k, v in zip(b["keys"], b["batch_valid"])
            if v]
    assert keys == [f"utt{i}" for i in range(7)]
