"""Bench harnesses stay runnable (CPU-tiny smoke, subprocess like the driver).

The driver runs bench.py on real hardware; these smokes keep the harnesses
from rotting between hardware runs.  Each runs in its own process with the
default (single-device) CPU topology — the 8-device test mesh would make
the tiny smoke batches non-divisible.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, extra_env: dict = None) -> list:
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS",)
    }
    env.update(extra_env or {})
    env["JAX_PLATFORMS"] = "cpu"
    # the axon plugin ignores the env var; jax.config.update before first
    # backend touch is the only reliable way to force the CPU smoke config
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        f"import sys; sys.path.insert(0, {ROOT!r});\n"
        f"import runpy; runpy.run_path({os.path.join(ROOT, script)!r}, "
        "run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1200, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return [
        json.loads(line) for line in out.stdout.splitlines()
        if line.startswith("{")
    ]


def test_bench_smoke():
    (res,) = _run("bench.py")
    assert res["metric"] == "audio_sec_per_sec_per_chip"
    assert res["value"] > 0


def test_e2e_bench_smoke():
    (res,) = _run(os.path.join("benchmarks", "e2e_bench.py"))
    assert res["metric"] == "e2e_audio_sec_per_sec_per_chip"
    assert res["value"] > 0 and res["steps"] > 0 and res["device_only"] > 0


def test_decode_bench_smoke():
    res = _run(os.path.join("benchmarks", "decode_bench.py"))
    metrics = {r["metric"] for r in res}
    assert {"decode_beam1", "decode_beam4",
            "decode_continuous_vs_static_ragged",
            "decode_speculative_oracle"} <= metrics
    for r in res:
        for k, v in r.items():
            if k.endswith("tokens_per_sec"):
                assert v > 0, r


def test_decode_bench_pool_only_gate():
    """PS_BENCH_POOL_ONLY runs exactly the beam-pool section (the knob the
    batch-scaling runs use on hardware)."""
    res = _run(
        os.path.join("benchmarks", "decode_bench.py"),
        extra_env={"PS_BENCH_POOL_ONLY": "1"},
    )
    assert [r["metric"] for r in res] == ["decode_beam_pool"]
    assert res[0]["pool_tokens_per_sec"] > 0


def test_decode_bench_spec_pool_gate():
    """PS_BENCH_SPEC_POOL runs the static/greedy-pool/spec-pool triple."""
    res = _run(
        os.path.join("benchmarks", "decode_bench.py"),
        extra_env={"PS_BENCH_SPEC_POOL": "1"},
    )
    assert [r["metric"] for r in res] == ["decode_spec_pool_ragged"]
    assert res[0]["spec_pool_tokens_per_sec"] > 0


def test_anatomy_bench_smoke():
    (res,) = _run(os.path.join("benchmarks", "anatomy.py"))
    assert res["metric"] == "step_anatomy"
    assert 0 < res["encoder_posterior_ms"] <= res["front_half_ms"] * 1.5
    assert res["front_half_ms"] < res["full_forward_ms"]
    assert res["full_forward_ms"] < res["train_step_ms"]
