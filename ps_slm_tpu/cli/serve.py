"""Streaming serving entry point.

Reads JSONL requests (``{"key": ..., "path": "<wav|ark:off|flac>"}`` — the
manifest row schema minus targets) from a file or stdin, decodes them
through the continuous slot pool (optionally with CTC-draft speculative
verification), and emits JSONL results ``{"key": ..., "text": ...}`` in
completion order as they finish — a long-running serving loop rather than
the batch decode of ``cli/decode.py``.

Usage:
    python -m ps_slm_tpu.cli.serve ++model_config... [requests.jsonl]
    cat requests.jsonl | python -m ps_slm_tpu.cli.serve ++model_config...

Config knobs are the decode set: ``decode_slots``, ``max_new_tokens``,
``num_beams`` (>1 serves through the beam pool,
inference/continuous_beam.py), ``speculative_ctc`` (+ ``spec_window``;
greedy only), ``quantization`` (int8 weights; ``quant_bits=4`` for
group-wise int4), ``kv_cache_bits=8`` (int8 KV cache), and
``stream_partials`` (also emit ``{"key", "partial": true, "text"}`` lines
with the text decoded so far at every pool harvest — token streaming;
greedy/speculative pools only).
The pool keeps the device busy across requests; results stream as soon as
each utterance finishes (docs/PERF.md serving numbers).

Routing (``serve_route=auto|pool|static``, default auto): "auto" serves in
segments of ``route_probe`` completions and re-chooses pool vs static
after each.  Measured per-segment throughput decides once both decoders
have been tried in the current length regime; until then the
sliding-window completion-length median is the prior (< ``route_static_below``
tokens -> static, its ~4x short-answer win on the 1.5B model — but the
measurement overrides the prior where it is wrong, e.g. compile-bound
static on small models; docs/PERF.md serve-routing table,
inference/routing.py).  A workload drifting across the length threshold
invalidates old measurements and re-explores.  ``stream_partials`` /
``speculative_ctc`` always serve through the pool.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None, *, stdin=None, stdout=None):
    from ps_slm_tpu.config import RunConfig, parse_cli
    from ps_slm_tpu.data.dataset import Collator
    from ps_slm_tpu.data.spm import SenseVoiceTokenizer
    from ps_slm_tpu.data.tokenizer import load_tokenizer
    from ps_slm_tpu.registry import get_model_factory
    from ps_slm_tpu.training import checkpoint as ckpt
    from ps_slm_tpu.utils.logging import setup_logger

    argv = list(argv if argv is not None else sys.argv[1:])
    req_path = None
    rest = []
    for a in argv:
        if a.startswith(("+", "-")):
            rest.append(a)
        elif "=" not in a or os.path.exists(a):
            # a positional requests file — existence check lets paths
            # containing '=' through; a non-existent '='-arg is a config
            # override
            if req_path is not None:
                raise ValueError(
                    f"multiple request files given: {req_path!r} and {a!r}"
                )
            req_path = a
        else:
            rest.append(a)
    cfg = parse_cli(rest, RunConfig())
    tc, mc, dc = cfg.train_config, cfg.model_config, cfg.dataset_config
    dc.inference_mode = True
    logger = setup_logger("serve", cfg.log_config.log_file)
    stdout = stdout or sys.stdout

    dtype = jnp.bfloat16 if tc.mixed_precision else jnp.float32
    tokenizer = load_tokenizer(mc.llm_path or None)
    encoder_tokenizer = None
    if mc.encoder_bpe_path or mc.encoder_path:
        try:
            encoder_tokenizer = SenseVoiceTokenizer(
                mc.encoder_bpe_path or mc.encoder_path
            )
        except (FileNotFoundError, OSError):
            pass
    if tc.speculative_ctc and encoder_tokenizer is None:
        raise ValueError(
            "speculative_ctc needs the encoder BPE model "
            "(model_config.encoder_path)"
        )
    # routing (serve_route): streaming/speculative pin the pool; otherwise
    # "auto" probes completion lengths and picks pool vs static batching
    route = tc.serve_route
    if route not in ("auto", "pool", "static"):
        raise ValueError(f"serve_route must be auto|pool|static, got {route!r}")
    if tc.stream_partials or tc.speculative_ctc:
        route = "pool"
    if route != "static":
        # pool paths implement plain greedy/beam only — validate the knobs
        # they would silently ignore (the static path honors them)
        from ps_slm_tpu.inference import validate_pool_decode_knobs

        validate_pool_decode_knobs(tc, "serve (slot-pool decoding)")

    model = get_model_factory(mc.factory)(
        tc, mc, rng=jax.random.PRNGKey(tc.seed), dtype=dtype
    )
    model.speech_token_id = tokenizer.speech_token_id
    model.pad_token_id = tokenizer.pad_token_id
    model.fbank_cfg = dc.fbank
    if mc.encoder_path:
        cmvn_path = os.path.join(mc.encoder_path, "am.mvn")
        if os.path.exists(cmvn_path):
            from ps_slm_tpu.ops.fbank import load_cmvn

            model.cmvn = load_cmvn(cmvn_path)
    if cfg.ckpt_path:
        n = len(ckpt.import_reference_checkpoint(model, cfg.ckpt_path, dtype))
        logger.info(f"loaded {n} tensors from {cfg.ckpt_path}")

    coll = Collator(tokenizer, dc, inference_mode=True)
    import random as _random

    from ps_slm_tpu.data.dataset import MultiTaskDataset

    prompt_rng = _random.Random(tc.seed)
    builder = MultiTaskDataset.for_requests(
        dc, tokenizer, encoder_tokenizer=encoder_tokenizer
    )

    source = open(req_path) if req_path else (stdin or sys.stdin)

    def emit_error(key, err):
        stdout.write(json.dumps({"key": key, "error": err}) + "\n")
        stdout.flush()

    # Non-blocking admission: a background thread does the (blocking) line
    # reads, and the generator below yields ``None`` — the pools' "nothing
    # ready right now" signal — whenever the queue is empty but decodes are
    # in flight.  Without this, the pool's refill loop blocked inside
    # ``next(requests())`` on a slow/streaming stdin with free slots,
    # stalling already-admitted utterances until enough requests arrived
    # (contradicting the completion-order streaming contract above).
    import queue as _queue
    import threading

    lines_q: _queue.Queue = _queue.Queue()
    _EOF = object()

    def _reader():
        try:
            for line in source:
                lines_q.put(line)
        finally:
            lines_q.put(_EOF)

    threading.Thread(target=_reader, daemon=True, name="serve-reader").start()
    flow = {"admitted": 0, "emitted": 0}

    def requests():
        from ps_slm_tpu.inference import ctc_draft

        i = 0
        while True:
            idle = flow["admitted"] == flow["emitted"]
            try:
                # idle pool: block until work (or EOF) arrives; otherwise
                # hand control back to the pool immediately
                line = lines_q.get(block=idle)
            except _queue.Empty:
                yield None
                continue
            if line is _EOF:
                return
            i += 1
            line = line.strip()
            if not line:
                continue
            # a long-running serving loop must survive one bad request
            # (malformed JSON, unknown task, unreadable audio): emit a
            # per-request error — the contract the length filter below
            # already follows — and keep the pool draining
            key = f"<line {i}>"
            try:
                item = json.loads(line)
                key = item.get("key", key)
                item.setdefault("target", "")
                item.setdefault("task", "ASR")
                sample = builder._build(item, prompt_rng, i)
                if sample is None:
                    emit_error(key, "filtered (length)")
                    continue
                hb = coll([sample])
                jb = {
                    k: jnp.asarray(v) for k, v in hb.items()
                    if isinstance(v, np.ndarray)
                }
                if tc.speculative_ctc:
                    draft = ctc_draft(
                        model, jb, encoder_tokenizer, tokenizer
                    )
            except Exception as e:  # noqa: BLE001 — per-request isolation
                logger.warning(f"bad request {key}: {e}")
                emit_error(key, f"{type(e).__name__}: {e}")
                continue
            flow["admitted"] += 1
            if tc.speculative_ctc:
                yield sample.key, (jb, draft, len(draft))
            else:
                yield sample.key, jb

    from ps_slm_tpu.inference import make_pool_decoder
    from ps_slm_tpu.inference.static_serve import StaticBatchDecoder

    on_partial = None
    if tc.stream_partials:
        # streaming contract: every harvest that grows a request's token
        # prefix emits the FULL text decoded so far (not a delta — byte-
        # level BPE can split one character across harvest boundaries)
        def on_partial(key, prefix):
            stdout.write(json.dumps({
                "key": key, "partial": True,
                "text": tokenizer.decode(prefix),
            }) + "\n")
            stdout.flush()

    def make_static():
        return StaticBatchDecoder(
            model, tc, dc, eos_token_id=tokenizer.eos_token_id
        )

    def make_pool():
        return make_pool_decoder(
            model, tc, dc, eos_token_id=tokenizer.eos_token_id
        )

    def routed(req_iter):
        """serve_route dispatch.  "auto" = inference/routing.py: cold-start
        on the pool, re-choose every route_probe completions — measured
        same-regime segment throughput when both decoders have one, else
        the sliding-window length prior (drift re-explores; see the module
        docstring)."""
        if route == "static":
            yield from make_static().run(req_iter)
            return
        if route == "pool":
            yield from make_pool().run(req_iter, on_partial=on_partial)
            return
        from ps_slm_tpu.inference.routing import route_serve

        yield from route_serve(
            req_iter, make_pool, make_static,
            probe=tc.route_probe, static_below=tc.route_static_below,
            on_partial=on_partial, log=logger.info,
        )

    n = 0
    for key, toks in routed(requests()):
        stdout.write(json.dumps(
            {"key": key, "text": tokenizer.decode(toks)}
        ) + "\n")
        stdout.flush()
        n += 1
        flow["emitted"] += 1
    if req_path:
        source.close()
    logger.info(f"served {n} requests")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
