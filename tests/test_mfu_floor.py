"""benchmarks/mfu_floor.py parser: envelope exclusion, phase split, buckets.

Builds a synthetic xplane proto shaped like a real TPU trace (full HLO
texts as event names, ``while`` envelopes spanning their body ops, stats
for hlo_category/flops/bytes/tf_op/source) and checks the accounting
rules measured on the real chip: leaves sum to the step envelope, phases
split on jvp/transpose, sources map to module buckets.
"""

import numpy as np
import pytest

pb = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

from benchmarks.mfu_floor import (  # noqa: E402
    bucketize, chip_peaks, parse_device_ops, phase_of,
)


def _plane(xs, name):
    p = xs.planes.add()
    p.name = name
    return p


def _stat_ids(plane, names):
    ids = {}
    for i, n in enumerate(names, start=1):
        md = plane.stat_metadata[i]
        md.id = i
        md.name = n
        ids[n] = i
    return ids


def _add_event(plane, line, sid, mid, name, dur_ps, stats):
    md = plane.event_metadata[mid]
    md.id = mid
    md.name = name
    ev = line.events.add()
    ev.metadata_id = mid
    ev.duration_ps = dur_ps
    for k, v in stats.items():
        s = ev.stats.add()
        s.metadata_id = sid[k]
        if isinstance(v, str):
            s.str_value = v
        elif isinstance(v, float):
            s.double_value = v
        else:
            s.int64_value = v


def _synthetic_space():
    xs = pb.XSpace()
    _plane(xs, "/host:CPU")  # must be ignored
    p = _plane(xs, "/device:TPU:0")
    sid = _stat_ids(
        p, ["hlo_category", "flops", "bytes_accessed", "tf_op", "source"]
    )

    steps = p.lines.add()
    steps.name = "Steps"
    for _ in range(2):
        ev = steps.events.add()
        ev.metadata_id = 1
        ev.duration_ps = 100_000
    p.event_metadata[1].id = 1
    p.event_metadata[1].name = "step"

    ops = p.lines.add()
    ops.name = "XLA Ops"
    # envelope spanning the two matmuls: must be EXCLUDED from leaf sums
    _add_event(
        p, ops, sid, 2,
        "%while.13 = (s32[]{:T(128)}, bf16[5,543,1536]{...}) while(...)",
        160_000, {"hlo_category": "while"},
    )
    for step in range(2):
        _add_event(
            p, ops, sid, 3,
            "%fusion.827 = bf16[5,543,1536]{...} fusion(...)",
            60_000,
            {"hlo_category": "convolution fusion", "flops": 2.0e9,
             "bytes_accessed": 1.0e6,
             "tf_op": "jit(train_step)/jvp(main)/dot_general",
             "source": "/root/repo/ps_slm_tpu/models/qwen2.py:100"},
        )
        _add_event(
            p, ops, sid, 4,
            "%fusion.901 = bf16[5,543,1536]{...} fusion(...)",
            30_000,
            {"hlo_category": "convolution fusion", "flops": 1.0e9,
             "bytes_accessed": 0.5e6,
             "tf_op": "jit(train_step)/transpose(jvp(main))/dot_general",
             "source": "/root/repo/ps_slm_tpu/models/qwen2.py:100"},
        )
        _add_event(
            p, ops, sid, 5,
            "%iota_add_fusion.1 = f32[516]{...} fusion(...)",
            10_000,
            {"hlo_category": "loop fusion", "flops": 0.0,
             "bytes_accessed": 2.0e3,
             "tf_op": "jit(train_step)/jvp(main)/add",
             "source": "/root/repo/ps_slm_tpu/models/sensevoice.py:120"},
        )
    return xs


def test_phase_of():
    assert phase_of("jit(train_step)/jvp(main)/sin:") == "fwd"
    assert phase_of("jit(train_step)/transpose(jvp(main))/dot:") == "bwd"
    assert phase_of("jit(train_step)/adamw/mul:") == "other"


def test_parse_excludes_envelopes_and_sums_to_step():
    ops, step_ms = parse_device_ops(_synthetic_space())
    assert step_ms == pytest.approx(100_000 / 1e9)
    names = {o[0] for o in ops}
    assert not any(n.startswith("while") for n in names)
    leaf_ps = sum(o[1] for o in ops)
    assert leaf_ps == 2 * 100_000  # 2 steps x (60+30+10) us


def test_bucketize_phase_module_category():
    ops, _ = parse_device_ops(_synthetic_space())
    rows = bucketize(ops, n_steps=2)
    by_key = {(r["phase"], r["module"], r["category"]): r for r in rows}
    fwd = by_key[("fwd", "qwen2.py", "convolution fusion")]
    bwd = by_key[("bwd", "qwen2.py", "convolution fusion")]
    enc = by_key[("fwd", "sensevoice.py", "loop fusion")]
    assert fwd["ms"] == pytest.approx(60_000 / 1e9)
    assert fwd["gflops"] == pytest.approx(2.0)
    assert bwd["ms"] == pytest.approx(30_000 / 1e9)
    assert enc["mbytes"] == pytest.approx(2.0e3 / 1e6)
    assert rows == sorted(rows, key=lambda r: -r["ms"])
    # leaf total equals the step envelope (the real-trace invariant)
    assert sum(r["ms"] for r in rows) == pytest.approx(100_000 / 1e9)


def test_chip_peaks():
    flops, bw = chip_peaks("TPU v5 lite")
    assert flops == pytest.approx(197.4e12)
    assert bw == pytest.approx(819e9)
    assert chip_peaks("TPU v9 mega") == chip_peaks("v5e")
