"""Does the slot pool actually REALIZE the per-row speculative gain?

``benchmarks/spec_real.py`` showed real trained-checkpoint CTC drafts buy
a 2.02x per-UTTERANCE forward reduction but that a batch-synchronous
decode realizes none of it (the worst row gates the batch).  The claimed
deployment vehicle is the per-slot pool (``inference/continuous_spec.py``),
where each request verifies its own draft independently.  This benchmark
closes that argument with a measurement: drive the SAME per-request
workload (real audio -> real CTC drafts from the trained checkpoint)
through the plain greedy slot pool and the speculative slot pool — both
built by the production `make_pool_decoder` dispatch `cli/decode.py`
uses — and count the pool forwards each needs to drain it.

Forward accounting: every launched chunk runs ``sync_every`` pool-step
forwards (greedy: 1 fresh token per slot per forward; spec: a verified
draft window per slot per forward).  Chunk-granularity waste (a chunk
keeps stepping slots that already finished) is part of both pools'
production behavior and is deliberately included.  A spec forward
processes ``window`` tokens per slot vs greedy's 1, but 1.5B decode is
weight-HBM-bound, so forwards — not tokens touched — set the wall-clock
(docs/PERF.md corruption sweep measured that conversion directly).

Output equality between the two pools is asserted per key (speculative
verification is exact in fp32).

Usage:
    python benchmarks/spec_pool_real.py --workdir=/tmp/ps_transfer_perfect \
        --out=benchmarks/spec_pool_real_tpu.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(workdir: str, *, num_slots: int = 8, limit: int = 0) -> dict:
    import jax.numpy as jnp

    from benchmarks.spec_real import _build
    from ps_slm_tpu.data.dataset import Collator, MultiTaskDataset
    from ps_slm_tpu.inference import ctc_draft, make_pool_decoder

    model, tc, tokenizer, enc_tok, _batches, dc = _build(workdir)
    tc.decode_slots = num_slots
    tc.continuous_batching = True

    ds = list(MultiTaskDataset(dc, tokenizer, "test", encoder_tokenizer=enc_tok))
    if limit:
        ds = ds[:limit]
    coll = Collator(tokenizer, dc, inference_mode=True)

    # shared prep (identical for both modes in cli/decode.py): per-request
    # device batch + the real CTC draft from the trained encoder
    reqs = []
    for s in ds:
        hb = coll([s])
        jb = {
            k: jnp.asarray(v) for k, v in hb.items()
            if isinstance(v, np.ndarray)
        }
        draft = ctc_draft(model, jb, enc_tok, tokenizer)
        reqs.append((s.key, jb, list(draft)))
    draft_tokens = sum(len(d) for _, _, d in reqs)

    def drive(spec: bool):
        tc.speculative_ctc = spec
        dec = make_pool_decoder(
            model, tc, dc, eos_token_id=tokenizer.eos_token_id
        )
        chunks = [0]
        orig = dec._launch_chunk

        def counted():
            chunks[0] += 1
            return orig()

        dec._launch_chunk = counted
        gen = (
            (k, (jb, d, len(d))) if spec else (k, jb)
            for k, jb, d in reqs
        )
        t0 = time.perf_counter()
        outs = {k: np.asarray(v) for k, v in dec.run(gen)}
        dt = time.perf_counter() - t0
        return outs, chunks[0], dec.sync_every, dt

    # warm both paths (compiles), then measure on fresh decoders
    drive(False)
    drive(True)
    g_outs, g_chunks, g_sync, g_dt = drive(False)
    s_outs, s_chunks, s_sync, s_dt = drive(True)

    assert set(g_outs) == set(s_outs), "pool output key sets differ"
    mismatch = [k for k in g_outs if not np.array_equal(g_outs[k], s_outs[k])]
    g_fwds = g_chunks * g_sync
    s_fwds = s_chunks * s_sync
    g_tokens = sum(len(v) for v in g_outs.values())

    return {
        "metric": "spec_pool_real",
        "ckpt": os.path.join(workdir, "transfer_model.bin"),
        "n_requests": len(reqs),
        "num_slots": num_slots,
        "draft_tokens_offered": draft_tokens,
        "tokens_emitted": g_tokens,
        "greedy_pool": {
            "chunks": g_chunks, "sync_every": g_sync,
            "forwards_to_drain": g_fwds, "wall_s": round(g_dt, 3),
        },
        "spec_pool": {
            "chunks": s_chunks, "sync_every": s_sync,
            "forwards_to_drain": s_fwds, "wall_s": round(s_dt, 3),
        },
        "pool_forward_reduction": round(g_fwds / max(s_fwds, 1), 3),
        "outputs_identical": not mismatch,
        "n_key_mismatch": len(mismatch),
    }


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    workdir = "/tmp/ps_transfer_perfect"
    out_path = None
    slots = 8
    limit = 0
    for a in argv:
        if a.startswith("--workdir="):
            workdir = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--slots="):
            slots = int(a.split("=", 1)[1])
        elif a.startswith("--limit="):
            limit = int(a.split("=", 1)[1])
    result = run(workdir, num_slots=slots, limit=limit)
    print(json.dumps(result), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
