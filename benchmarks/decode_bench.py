"""Decode throughput benchmark: tokens/sec + RTF at 1.5B (BASELINE.md row 2).

Measures the full TASU batch-decode path (audio -> encoder -> posterior ->
PSD -> projector -> merge -> KV-cache decode) on synthetic audio at the
reference decode settings (greedy and beam-4, max_new_tokens bounded).

Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.inference.generate import generate
    from ps_slm_tpu.models.tasu import model_factory

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
        batch = int(os.environ.get("PS_BENCH_DECODE_BATCH", "8"))
        frames, max_new = 256, 32
    else:
        llm_over = dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
        )
        enc_over = dict(
            input_size=80, output_size=32, attention_heads=2,
            linear_units=64, num_blocks=2, tp_blocks=1, kernel_size=5,
            vocab_size=64,
        )
        batch, frames, max_new = 2, 32, 8

    # PS_BENCH_QUANT=1: int8 weight-only LLM — decode is weight-HBM-bound,
    # so halving the weight bytes is a direct throughput win (docs/PERF.md:
    # greedy 1169 -> 1501 tok/s, beam-4 885 -> 1042).  PS_BENCH_QUANT=4:
    # group-wise int4 (s4 storage) — another 2x cut in weight bytes.
    quant = os.environ.get("PS_BENCH_QUANT", "0")
    tc = TrainConfig(
        ctc_posterior=True, do_psd=True, quantization=quant in ("1", "4", "8"),
        quant_bits=4 if quant == "4" else 8,
    )
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=enc_over["vocab_size"], llm_dim=llm_over["hidden_size"],
        encoder_projector_ds_rate=1,
        llm_config_overrides=llm_over, encoder_config_overrides=enc_over,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0), dtype=dtype)
    model.speech_token_id = llm_over["vocab_size"] - 2

    rng = np.random.default_rng(0)
    s = 32
    ids = rng.integers(1, 1000 if on_tpu else 200, size=(batch, s)).astype(np.int32)
    ids[:, -1] = model.speech_token_id  # left-pad style: speech near the end
    mask = np.ones((batch, s), bool)
    mask[:, :4] = False
    jbatch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "input_features": jnp.asarray(
            rng.normal(size=(batch, frames, enc_over["input_size"])), dtype
        ),
        "input_feature_length": jnp.asarray(
            np.full((batch,), frames, np.int32)
        ),
    }
    eos = 0
    audio_sec = batch * frames * 0.060
    # PS_BENCH_KV=8: int8 KV cache on the static greedy/beam rows (decode
    # is KV-HBM-bound at long context; half the cache bytes)
    kv_bits = int(os.environ.get("PS_BENCH_KV", "16"))

    if os.environ.get("PS_BENCH_POOL_ONLY") == "1":
        # pool batch-scaling runs (roadmap #5): beam pool at large slot
        # counts (PS_BENCH_DECODE_BATCH) without the static sweep /
        # ragged / speculative sections; includes its own static-beam
        # comparison at the same batch
        _beam_pool_bench(model, jbatch, batch, frames, max_new, eos)
        return

    if os.environ.get("PS_BENCH_SPEC_POOL") == "1":
        # reproducible source of docs/PERF.md's "Speculative slot pool"
        # table (static vs greedy pool vs spec pool, ragged, oracle drafts)
        _spec_pool_bench(model, jbatch, batch, frames, max_new, eos, on_tpu)
        return

    if os.environ.get("PS_BENCH_RAGGED_ONLY") == "1":
        # pool batch-scaling runs: skip the static sweep + later sections
        _ragged_comparison(
            model, jbatch, batch, frames, max_new, eos, on_tpu,
        )
        return

    for beams in (1, 4):
        out = generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=beams, max_new_tokens=max_new, kv_bits=kv_bits,
        )
        _ = np.asarray(out)  # sync
        t0 = time.perf_counter()
        n_iter = 2
        for _ in range(n_iter):
            out = generate(
                model, model.params, jbatch, eos_token_id=eos,
                num_beams=beams, max_new_tokens=max_new, kv_bits=kv_bits,
            )
            _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n_iter
        tokens = int((np.asarray(out) != eos).sum()) + batch
        print(json.dumps({
            "metric": f"decode_beam{beams}",
            "tokens_per_sec": round(tokens / dt, 1),
            "audio_sec_per_sec": round(audio_sec / dt, 1),
            "rtf": round(dt / audio_sec, 4),
            "batch": batch, "frames": frames, "max_new_tokens": max_new,
            **({"kv_bits": kv_bits} if kv_bits != 16 else {}),
        }))

    if os.environ.get("PS_BENCH_STATIC_ONLY") == "1":
        return

    _ragged_comparison(
        model, jbatch, batch, frames, max_new, eos, on_tpu,
    )
    _beam_pool_bench(model, jbatch, batch, frames, max_new, eos)
    _speculative_oracle(model, jbatch, batch, max_new, eos)
    _speculative_corruption_sweep(model, jbatch, batch, max_new, eos)


def _ragged_comparison(model, jbatch, batch, frames, max_new, eos, on_tpu):
    """Continuous slot pool vs static batching under ragged completion
    lengths.  Random-init models never emit EOS, so per-request completion
    lengths L_i are drawn once and applied identically to both modes: the
    static batch runs to its longest member (what HF generate does when EOS
    times are ragged); the continuous pool frees each slot at its own L_i
    (via stop_after — the mechanics are the same as a real EOS)."""
    import jax.numpy as jnp

    from ps_slm_tpu.inference.continuous import ContinuousGreedyDecoder
    from ps_slm_tpu.inference.generate import generate

    rng = np.random.default_rng(7)
    # PS_BENCH_NREQ pins the workload (request count + length draws) so
    # slot-count sweeps compare on identical work
    n_req = int(os.environ.get("PS_BENCH_NREQ", 4 * batch))
    ragged_max = max_new * (4 if on_tpu else 2)
    lengths = rng.integers(max_new // 4, ragged_max + 1, size=n_req)
    s = int(jbatch["input_ids"].shape[1])

    def request(i):
        return {
            k: v[i % batch: i % batch + 1] for k, v in jbatch.items()
        }

    # --- static: batches in submission order; each runs to its longest ---
    group_maxes = [
        -(-int(np.max(lengths[b0: b0 + batch])) // 16) * 16
        for b0 in range(0, n_req, batch)
    ]
    for gm in sorted(set(group_maxes)):  # compile warmup, untimed
        _ = np.asarray(generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=1, max_new_tokens=gm,
        ))
    t0 = time.perf_counter()
    for gm in group_maxes:
        out = generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=1, max_new_tokens=gm,
        )
        _ = np.asarray(out)
    static_dt = time.perf_counter() - t0

    # --- continuous: slot pool with per-request stop_after ---
    prefill_len = s + frames  # merged bucket bound for this workload
    caps = {f"r{i}": int(lengths[i]) for i in range(n_req)}

    def run_pool():
        dec = ContinuousGreedyDecoder(
            model, model.params, num_slots=batch, prefill_len=prefill_len,
            max_new_tokens=ragged_max, eos_token_id=eos, sync_every=8,
        )
        reqs = ((f"r{i}", request(i)) for i in range(n_req))
        return sum(1 for _ in dec.run(reqs, stop_after=caps))

    run_pool()  # compile warmup (insert + pool step), untimed
    t0 = time.perf_counter()
    done = run_pool()
    cont_dt = time.perf_counter() - t0
    assert done == n_req

    tokens = int(lengths.sum())
    print(json.dumps({
        "metric": "decode_continuous_vs_static_ragged",
        "n_requests": n_req,
        "tokens": tokens,
        "static_tokens_per_sec": round(tokens / static_dt, 1),
        "continuous_tokens_per_sec": round(tokens / cont_dt, 1),
        "speedup": round(static_dt / cont_dt, 3),
        "slots": batch, "length_range": [int(lengths.min()), int(lengths.max())],
    }))




def _spec_pool_bench(model, jbatch, batch, frames, max_new, eos, on_tpu):
    """Static vs greedy pool vs SPECULATIVE pool on one ragged workload.

    Oracle drafts (= the greedy continuation) give the acceptance ceiling;
    the spec pool's output equals the greedy pool's by construction
    (tests/test_continuous_spec.py).  Same workload recipe as
    _ragged_comparison so the three rows are comparable."""
    from ps_slm_tpu.inference.continuous import ContinuousGreedyDecoder
    from ps_slm_tpu.inference.continuous_spec import (
        ContinuousSpeculativeDecoder,
    )
    from ps_slm_tpu.inference.generate import generate

    rng = np.random.default_rng(7)
    n_req = int(os.environ.get("PS_BENCH_NREQ", 4 * batch))
    ragged_max = max_new * (4 if on_tpu else 2)
    lengths = rng.integers(max_new // 4, ragged_max + 1, size=n_req)
    s = int(jbatch["input_ids"].shape[1])
    prefill_len = s + frames
    caps = {f"r{i}": int(lengths[i]) for i in range(n_req)}

    def request(i):
        return {k: v[i % batch: i % batch + 1] for k, v in jbatch.items()}

    # oracle drafts: the full greedy continuation per distinct row
    rows = np.asarray(generate(
        model, model.params, jbatch, eos_token_id=eos,
        num_beams=1, max_new_tokens=ragged_max,
    ))

    # --- static (same scheme as _ragged_comparison) ---
    group_maxes = [
        -(-int(np.max(lengths[b0: b0 + batch])) // 16) * 16
        for b0 in range(0, n_req, batch)
    ]
    for gm in sorted(set(group_maxes)):
        _ = np.asarray(generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=1, max_new_tokens=gm,
        ))
    t0 = time.perf_counter()
    for gm in group_maxes:
        _ = np.asarray(generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=1, max_new_tokens=gm,
        ))
    static_dt = time.perf_counter() - t0

    # --- greedy pool ---
    def run_greedy():
        dec = ContinuousGreedyDecoder(
            model, model.params, num_slots=batch, prefill_len=prefill_len,
            max_new_tokens=ragged_max, eos_token_id=eos, sync_every=8,
        )
        reqs = ((f"r{i}", request(i)) for i in range(n_req))
        return sum(1 for _ in dec.run(reqs, stop_after=caps))

    run_greedy()
    t0 = time.perf_counter()
    assert run_greedy() == n_req
    greedy_dt = time.perf_counter() - t0

    # --- speculative pool, oracle drafts ---
    def run_spec():
        dec = ContinuousSpeculativeDecoder(
            model, model.params, num_slots=batch, prefill_len=prefill_len,
            max_new_tokens=ragged_max, eos_token_id=eos,
            window=8, draft_max=ragged_max, sync_every=2,
        )
        reqs = (
            (f"r{i}", (request(i), list(rows[i % batch][: lengths[i]]),
                       int(lengths[i])))
            for i in range(n_req)
        )
        return sum(1 for _ in dec.run(reqs, stop_after=caps))

    run_spec()
    t0 = time.perf_counter()
    assert run_spec() == n_req
    spec_dt = time.perf_counter() - t0

    tokens = int(lengths.sum())
    print(json.dumps({
        "metric": "decode_spec_pool_ragged",
        "n_requests": n_req, "tokens": tokens,
        "static_tokens_per_sec": round(tokens / static_dt, 1),
        "greedy_pool_tokens_per_sec": round(tokens / greedy_dt, 1),
        "spec_pool_tokens_per_sec": round(tokens / spec_dt, 1),
        "spec_vs_static": round(static_dt / spec_dt, 3),
        "spec_vs_greedy_pool": round(greedy_dt / spec_dt, 3),
        "slots": batch, "window": 8,
        "length_range": [int(lengths.min()), int(lengths.max())],
    }))


def _beam_pool_bench(model, jbatch, batch, frames, max_new, eos):
    """Continuous BEAM pool (inference/continuous_beam.py) throughput vs
    the static beam path at the same beam width.  Random-init models never
    finish early, so this measures the pool's steady-state rate (its
    ragged-completion advantage comes on top in real serving); output is
    bit-identical to static beam (tests/test_continuous_beam.py)."""
    from ps_slm_tpu.inference.continuous_beam import ContinuousBeamDecoder
    from ps_slm_tpu.inference.generate import generate

    s = int(jbatch["input_ids"].shape[1])
    n_req = 2 * batch
    prefill_len = s + frames

    def request(i):
        return {k: v[i % batch: i % batch + 1] for k, v in jbatch.items()}

    # static beam-4 timing at the same batch
    out = generate(
        model, model.params, jbatch, eos_token_id=eos,
        num_beams=4, max_new_tokens=max_new,
    )
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n_req // batch):
        out = generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=4, max_new_tokens=max_new,
        )
        _ = np.asarray(out)
    static_dt = time.perf_counter() - t0

    sync_every = int(os.environ.get("PS_BENCH_SYNC_EVERY", "8"))

    def run_pool():
        dec = ContinuousBeamDecoder(
            model, model.params, num_slots=batch, prefill_len=prefill_len,
            max_new_tokens=max_new, eos_token_id=eos, num_beams=4,
            sync_every=sync_every,
        )
        reqs = ((f"r{i}", request(i)) for i in range(n_req))
        return sum(1 for _ in dec.run(reqs))

    run_pool()  # compile warmup
    t0 = time.perf_counter()
    done = run_pool()
    pool_dt = time.perf_counter() - t0
    assert done == n_req

    tokens = n_req * max_new
    print(json.dumps({
        "metric": "decode_beam_pool",
        "n_requests": n_req,
        "num_beams": 4,
        "static_tokens_per_sec": round(tokens / static_dt, 1),
        "pool_tokens_per_sec": round(tokens / pool_dt, 1),
        "speedup": round(static_dt / pool_dt, 3),
        "slots": batch,
        "sync_every": sync_every,
    }))


def _speculative_oracle(model, jbatch, batch, max_new, eos):
    """Upper-bound speculative throughput: oracle draft (= the greedy output
    itself, window always accepted).  Real acceptance depends on how well
    the CTC transcript matches the trained LLM's output; this brackets the
    ceiling honestly."""
    import jax.numpy as jnp

    from ps_slm_tpu.inference.generate import generate

    greedy = np.asarray(generate(
        model, model.params, jbatch, eos_token_id=eos,
        num_beams=1, max_new_tokens=max_new,
    ))
    lens = (greedy != eos).sum(axis=1).astype(np.int32)
    kwargs = dict(
        draft_ids=jnp.asarray(greedy.astype(np.int32)),
        draft_lens=jnp.asarray(np.maximum(lens, 1)),
    )
    # warm both
    for kw in ({}, kwargs):
        _ = np.asarray(generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=1, max_new_tokens=max_new, **kw,
        ))
    res = {}
    for name, kw in (("greedy", {}), ("speculative_oracle", kwargs)):
        t0 = time.perf_counter()
        for _ in range(2):
            out = generate(
                model, model.params, jbatch, eos_token_id=eos,
                num_beams=1, max_new_tokens=max_new, **kw,
            )
            _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / 2
        toks = int((np.asarray(out) != eos).sum()) + batch
        res[name] = toks / dt
    # equivalence is exact in exact arithmetic (pinned by the fp32 CPU tests
    # in tests/test_speculative.py); in bf16 the windowed forward can round
    # near-tie logits differently than the one-token forward, and random
    # -init weights are the worst case for ties — report agreement honestly
    agree = float((np.asarray(out) == greedy).mean())
    print(json.dumps({
        "metric": "decode_speculative_oracle",
        "greedy_tokens_per_sec": round(res["greedy"], 1),
        "oracle_draft_tokens_per_sec": round(res["speculative_oracle"], 1),
        "ceiling_speedup": round(res["speculative_oracle"] / res["greedy"], 3),
        "token_agreement_bf16": round(agree, 4),
        "note": "oracle draft = greedy output; real gain scales with CTC/LLM agreement",
    }))

def _speculative_corruption_sweep(model, jbatch, batch, max_new, eos):
    """Off-oracle speculative characterization (VERDICT r2 item 5): corrupt
    the oracle draft by substituting each token with probability p and
    report tokens/s + measured acceptance (emitted tokens per LLM forward)
    per p.  p is a proxy for CTC-draft WER; the break-even p (where
    speculative matches plain greedy) turns the 'between 1x and the
    ceiling' hand-wave into a curve."""
    import jax.numpy as jnp

    from ps_slm_tpu.inference.generate import _merged_fn, generate
    from ps_slm_tpu.inference.speculative import speculative_greedy_generate

    greedy = np.asarray(generate(
        model, model.params, jbatch, eos_token_id=eos,
        num_beams=1, max_new_tokens=max_new,
    ))
    lens = np.maximum((greedy != eos).sum(axis=1).astype(np.int32), 1)
    vocab = model.llm_cfg.vocab_size

    # greedy reference timing
    t0 = time.perf_counter()
    for _ in range(2):
        out = generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=1, max_new_tokens=max_new,
        )
        _ = np.asarray(out)
    greedy_tps = (int((np.asarray(out) != eos).sum()) + batch) / (
        (time.perf_counter() - t0) / 2
    )

    rows = []
    rng = np.random.default_rng(11)
    for p in (0.0, 0.05, 0.1, 0.2, 0.3, 0.5):
        draft = greedy.astype(np.int32).copy()
        flips = rng.random(draft.shape) < p
        draft = np.where(flips, (draft + 7) % vocab, draft)
        kwargs = dict(
            draft_ids=jnp.asarray(draft), draft_lens=jnp.asarray(lens),
        )
        # warm (shapes shared across p after the first)
        out = generate(
            model, model.params, jbatch, eos_token_id=eos,
            num_beams=1, max_new_tokens=max_new, **kwargs,
        )
        _ = np.asarray(out)
        t0 = time.perf_counter()
        n_runs = 2
        for _ in range(n_runs):
            out = generate(
                model, model.params, jbatch, eos_token_id=eos,
                num_beams=1, max_new_tokens=max_new, **kwargs,
            )
            _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n_runs
        toks = int((np.asarray(out) != eos).sum()) + batch

        # acceptance from the instrumented path (n_fwd)
        merged = _merged_fn(model)(model.params, jbatch)
        _, n_fwd = speculative_greedy_generate(
            model.params["llm"], model.llm_cfg,
            merged.embeds, merged.attention_mask, merged.position_ids,
            jnp.asarray(draft), jnp.asarray(lens),
            max_new_tokens=max_new, eos_token_id=eos,
        )
        rows.append({
            "p": p,
            "tokens_per_sec": round(toks / dt, 1),
            "speedup_vs_greedy": round(toks / dt / greedy_tps, 3),
            "tokens_per_forward": round(toks / batch / int(n_fwd), 2),
        })
    print(json.dumps({
        "metric": "decode_speculative_corruption_sweep",
        "greedy_tokens_per_sec": round(greedy_tps, 1),
        "sweep": rows,
        "note": (
            "p = per-token draft substitution rate (proxy for CTC/LLM "
            "disagreement); output bit-identical to greedy at every p"
        ),
    }))


if __name__ == "__main__":
    main()
