"""MFU floor: per-op device-time accounting of the flagship train step.

VERDICT r3 item 3: bench.py reports MFU 0.67 with "~10 ms of glue" and a
backward/forward ratio of 1.00 vs the 0.93 dgrad-only analytic prediction —
asserted from coarse scan-level numbers, not itemized.  This tool captures
a ``jax.profiler`` trace of the exact bench.py flagship step (same shapes,
same make_train_step), parses the xplane proto, and accounts every
picosecond of device time:

- TPU "XLA Ops" events carry the FULL HLO instruction text as their name
  plus per-event ``hlo_category``, ``flops``, ``bytes_accessed``,
  ``source_stack`` and ``tf_op`` stats.
- ``while``/``conditional`` events are ENVELOPES spanning their body ops
  (the scan bodies are recorded per iteration); excluding them makes the
  leaf sum close to the "Steps" line duration exactly (measured: 129.58 of
  129.59 ms).
- phase attribution: ``tf_op`` contains ``transpose(...)`` for VJP-side ops
  and ``jvp(...)`` for forward ops — the fwd/bwd split falls out per op.
- per-bucket roofline: compute bound = flops/peak_flops; the bandwidth
  column reports achieved bytes/s against HBM (``bytes_accessed`` counts
  every operand read including VMEM-resident re-reads, so it upper-bounds
  HBM traffic — ops can legitimately exceed HBM bandwidth).

    python benchmarks/mfu_floor.py            # flagship on the real chip
    python benchmarks/mfu_floor.py --dump     # raw top ops with stats
    python benchmarks/mfu_floor.py --steps=8

Prints the per-bucket table (ms/step, achieved TFLOP/s, %peak, GB/s) + one
JSON line, and leaves the raw trace under --workdir for TensorBoard.

The reference has no profiling beyond wall-clock timers
(deepspeed_utils.py:315-316); this closes SURVEY.md §5's tracing row at
per-op granularity.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# peak per chip: (bf16 FLOP/s, HBM bytes/s)
PEAKS = {
    "v5 lite": (197.4e12, 819e9),
    "v5e": (197.4e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6 lite": (918e12, 1640e9),
}

ENVELOPES = ("while", "conditional", "call")


def chip_peaks(device_kind: str):
    dk = device_kind.lower()
    for key, peaks in PEAKS.items():
        if key in dk:
            return peaks
    return PEAKS["v5e"]


# ----------------------------------------------------------------------------
# trace parsing
# ----------------------------------------------------------------------------

def load_xspace(profile_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(glob.glob(
        os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True,
    ))
    if not pbs:
        raise FileNotFoundError(f"no .xplane.pb under {profile_dir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _stats_of(plane, ev, md) -> dict:
    st = plane.stat_metadata
    out = {}
    for s in list(ev.stats) + list(md.stats):
        name = st[s.metadata_id].name
        out[name] = (
            s.str_value
            or (st[s.ref_value].name if s.ref_value else "")
            or s.int64_value or s.uint64_value or s.double_value
        )
    return out


def parse_device_ops(xs):
    """(ops, step_ms): ops = [(short_name, dur_ps, category, flops, bytes,
    phase, module)] for every leaf XLA-op execution on the TPU plane;
    step_ms = mean "Steps"-line envelope duration (ground truth)."""
    ops, step_ps = [], []
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name == "Steps":
                step_ps += [ev.duration_ps for ev in line.events]
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                stats = _stats_of(plane, ev, md)
                cat = str(stats.get("hlo_category", "?"))
                if cat in ENVELOPES:
                    continue
                short = md.name.split(" = ")[0].lstrip("%")
                tf_op = str(stats.get("tf_op", ""))
                phase = phase_of(tf_op)
                src = str(stats.get("source", ""))
                module = src.rsplit("/", 1)[-1].split(":")[0] or "?"
                ops.append((
                    short, ev.duration_ps, cat,
                    float(stats.get("flops", 0) or 0),
                    float(stats.get("bytes_accessed", 0) or 0),
                    phase, module,
                ))
    step_ms = float(np.mean(step_ps)) / 1e9 if step_ps else 0.0
    return ops, step_ms


def phase_of(tf_op: str) -> str:
    if "transpose" in tf_op:
        return "bwd"
    if "jvp" in tf_op:
        return "fwd"
    return "other"


def bucketize(ops, n_steps: int):
    """Aggregate leaf ops -> rows keyed (phase, module, category)."""
    agg = {}
    for short, ps, cat, flops, nbytes, phase, module in ops:
        key = (phase, module, cat)
        row = agg.setdefault(key, [0, 0.0, 0.0, 0, {}])
        row[0] += ps
        row[1] += flops
        row[2] += nbytes
        row[3] += 1
        tops = row[4]
        tops[short] = tops.get(short, 0) + ps
    out = []
    for (phase, module, cat), (ps, flops, nbytes, n, tops) in agg.items():
        top = max(tops.items(), key=lambda kv: kv[1])[0]
        out.append({
            "phase": phase, "module": module, "category": cat,
            "ms": ps / 1e9 / n_steps,
            "gflops": flops / 1e9 / n_steps,
            "mbytes": nbytes / 1e6 / n_steps,
            "ops": n // n_steps, "top": top,
        })
    return sorted(out, key=lambda r: -r["ms"])


# ----------------------------------------------------------------------------
# flagship step (bench.py construction, importable pieces reused)
# ----------------------------------------------------------------------------

def build_step():
    import jax
    import jax.numpy as jnp

    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models.tasu import model_factory, trainable_mask
    from ps_slm_tpu.parallel import mesh as meshlib
    from ps_slm_tpu.training.step import make_train_step
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )

    import bench  # repo-root bench.py: the flagship shapes live there

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
        batch, frames = bench.BATCH, bench.FRAMES
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
        batch, frames = 2, 64

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

    mesh = meshlib.build_mesh(None)
    model.params = meshlib.shard_params(model.params, mesh)
    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)
    step = make_train_step(model, tx, trainable)

    rng = np.random.default_rng(0)
    text = bench.TEXT_LEN
    ids = rng.integers(1, 1000, size=(batch, text)).astype(np.int32)
    ids[:, 3] = model.speech_token_id
    labels = ids.copy()
    labels[:, :8] = -100
    gb = meshlib.shard_batch({
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((batch, text), bool),
        "labels": jnp.asarray(labels),
        "input_features": jnp.asarray(rng.normal(
            size=(batch, frames, enc_over["input_size"])), dtype),
        "input_feature_length": jnp.full((batch,), frames, jnp.int32),
    }, mesh)
    return step, state, gb, dict(batch=batch, frames=frames, text=text)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    steps = 5
    workdir = "/tmp/ps_mfu_floor"
    dump = "--dump" in argv
    for a in argv:
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])
        elif a.startswith("--workdir="):
            workdir = a.split("=", 1)[1]

    import jax

    peak_flops, peak_bw = chip_peaks(jax.devices()[0].device_kind)

    step, state, gb, info = build_step()
    key = jax.random.PRNGKey(0)
    # warm three: first compile + donated-layout recompile
    for _ in range(3):
        state, m = step(state, gb, key)
    assert np.isfinite(float(m["loss"]))

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, gb, key)
    _ = float(m["loss"])
    wall_ms = (time.perf_counter() - t0) / steps * 1000.0

    jax.profiler.start_trace(workdir)
    for _ in range(steps):
        state, m = step(state, gb, key)
    _ = float(m["loss"])
    jax.profiler.stop_trace()

    xs = load_xspace(workdir)
    ops, step_ms = parse_device_ops(xs)
    if not ops:
        print(json.dumps({
            "metric": "mfu_floor", "error": "no device ops in trace",
            "planes": [p.name for p in xs.planes],
        }))
        return 1

    if dump:
        agg = {}
        for short, ps, cat, flops, nbytes, phase, module in ops:
            row = agg.setdefault(short, [0, 0, cat, 0.0, 0.0])
            row[0] += ps
            row[1] += 1
            row[3] += flops
            row[4] += nbytes
        for name, (ps, n, cat, fl, by) in sorted(
            agg.items(), key=lambda kv: -kv[1][0]
        )[:60]:
            print(f"{ps / 1e9 / steps:8.3f} ms x{n // steps:<4d} "
                  f"{cat:20s} {fl / 1e9 / steps:9.2f}G "
                  f"{by / 1e6 / steps:9.1f}MB  {name[:44]}")
        return 0

    rows = bucketize(ops, steps)
    leaf_ms = sum(r["ms"] for r in rows)
    tot_gflops = sum(r["gflops"] for r in rows)
    hw_mfu = tot_gflops * 1e9 / (step_ms / 1e3) / peak_flops

    print(f"# flagship step batch={info['batch']} frames={info['frames']} "
          f"text={info['text']}")
    print(f"# wall {wall_ms:.1f} ms | step envelope {step_ms:.2f} ms | "
          f"leaf-op sum {leaf_ms:.2f} ms (accounting gap "
          f"{step_ms - leaf_ms:+.2f} ms)")
    print(f"# total {tot_gflops / 1e3:.2f} TFLOP/step -> hardware MFU "
          f"{hw_mfu:.3f} at {peak_flops / 1e12:.0f} TFLOP/s peak")
    print(f"{'ms':>8} {'%':>5} {'phase':5} {'module':22} {'category':20} "
          f"{'TFLOP/s':>8} {'%peak':>6} {'GB/s':>7}  top op")
    table = []
    for r in rows:
        if r["ms"] < 0.01:
            continue
        # 1 GFLOP/ms == 1 TFLOP/s
        tflops = r["gflops"] / r["ms"] if r["ms"] else 0.0
        gbs = r["mbytes"] / r["ms"] if r["ms"] else 0.0
        print(f"{r['ms']:8.2f} {100 * r['ms'] / leaf_ms:5.1f} "
              f"{r['phase']:5} {r['module']:22} {r['category']:20} "
              f"{tflops:8.1f} {100 * tflops * 1e12 / peak_flops:6.1f} "
              f"{gbs:7.0f}  {r['top'][:36]}")
        table.append({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in r.items()})

    print(json.dumps({
        "metric": "mfu_floor", "wall_ms_per_step": round(wall_ms, 2),
        "step_ms": round(step_ms, 2), "leaf_ms": round(leaf_ms, 2),
        "tflop_per_step": round(tot_gflops / 1e3, 3),
        "hw_mfu": round(hw_mfu, 4), "steps": steps,
        "peak_tflops": peak_flops / 1e12,
        "buckets": table,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
