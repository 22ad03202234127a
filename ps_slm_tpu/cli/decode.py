"""Batch decode entry point.

Replaces ``Multitask/inference_batch.py`` (:61-151) and the decode half of
``scripts/decode_sensevoice.sh:60-97``: stream the test manifest with LEFT
padding, run beam (default 4) / greedy decode, write ``key\\ttext`` pred and
gt files.  Score afterwards with:

    python -m ps_slm_tpu.tools.clean_marks <decode_log>_pred
    python -m ps_slm_tpu.tools.wer --char=1 -v=1 <gt> <pred>
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from ps_slm_tpu.config import RunConfig, parse_cli
    from ps_slm_tpu.data.spm import SenseVoiceTokenizer
    from ps_slm_tpu.data.tokenizer import load_tokenizer
    from ps_slm_tpu.inference.generate import generate
    from ps_slm_tpu.registry import get_dataset_factory, get_model_factory
    from ps_slm_tpu.training import checkpoint as ckpt
    from ps_slm_tpu.utils.logging import setup_logger
    from ps_slm_tpu.utils.profiler import StepTimer

    cfg = parse_cli(argv if argv is not None else sys.argv[1:], RunConfig())
    tc, mc, dc = cfg.train_config, cfg.model_config, cfg.dataset_config
    dc.inference_mode = True
    _validate_decode_mode(tc)
    logger = setup_logger("decode", cfg.log_config.log_file)

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
        loaded = ckpt.import_reference_checkpoint(model, cfg.ckpt_path, dtype)
        logger.info(f"loaded {len(loaded)} tensors from {cfg.ckpt_path}")

    # multi-process decode (reference inference_batch_deepspeed.py): each
    # host takes its deterministic shard and writes a suffixed file
    num_hosts = int(os.environ.get("PS_NUM_HOSTS", "1"))
    host_id = int(os.environ.get("PS_HOST_ID", "0"))
    batches = get_dataset_factory(dc.factory)(
        dc, tokenizer, "test", encoder_tokenizer=encoder_tokenizer,
        num_hosts=num_hosts, host_id=host_id,
        # "padding" strategy decodes at fixed val_batch_size
        # (reference inference_batch.py:129-132)
        fixed_batch_size=(
            tc.val_batch_size
            if tc.batching_strategy != "dynamic" else None
        ),
    )

    decode_log = cfg.decode_log or "decode"
    if num_hosts > 1:
        decode_log = f"{decode_log}.part{host_id}"
    os.makedirs(os.path.dirname(decode_log) or ".", exist_ok=True)
    pred_path = decode_log + "_pred"
    gt_path = decode_log + "_gt"
    timer = StepTimer()
    audio_secs = 0.0
    n_tokens = 0

    if tc.continuous_batching:
        return _decode_continuous(
            model, tc, dc, tokenizer, encoder_tokenizer,
            num_hosts, host_id, pred_path, gt_path, logger,
        )

    if tc.speculative_ctc:
        if tc.num_beams != 1:
            raise ValueError("speculative_ctc requires num_beams=1 (greedy)")
        if encoder_tokenizer is None:
            raise ValueError(
                "speculative_ctc needs the encoder BPE model "
                "(model_config.encoder_path) to decode the CTC draft"
            )

    with open(pred_path, "w") as fpred, open(gt_path, "w") as fgt:
        for batch in batches:
            jbatch = {
                k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, np.ndarray)
            }
            spec_kwargs = {}
            if tc.speculative_ctc:
                spec_kwargs = _ctc_draft_kwargs(
                    model, jbatch, encoder_tokenizer, tokenizer,
                    tc.spec_window,
                )
            timer.start()
            out = generate(
                model, model.params, jbatch,
                eos_token_id=tokenizer.eos_token_id,
                num_beams=tc.num_beams,
                max_new_tokens=tc.max_new_tokens,
                do_sample=tc.do_sample,
                min_length=tc.min_length,
                top_p=tc.top_p,
                temperature=tc.temperature,
                length_penalty=tc.length_penalty,
                repetition_penalty=tc.repetition_penalty,
                kv_bits=tc.kv_cache_bits,
                **spec_kwargs,
            )
            out = np.asarray(out)
            timer.stop(_audio_secs(batch))
            audio_secs += _audio_secs(batch)
            n_tokens += int(
                (out != tokenizer.eos_token_id).sum()
            )
            texts = tokenizer.batch_decode(out)
            for key, target, text, valid in zip(
                batch["keys"], batch["targets"], texts,
                batch.get("batch_valid", [True] * len(texts)),
            ):
                if not valid:
                    continue
                fpred.write(f"{key}\t{text}\n")
                fgt.write(f"{key}\t{target}\n")

    rtf_inv = timer.audio_sec_per_sec
    toks_per_sec = n_tokens / max(sum(timer._times), 1e-9)
    logger.info(
        f"decode done: {pred_path}; {rtf_inv:.1f} audio-s/s "
        f"(RTF {1.0 / rtf_inv if rtf_inv else float('inf'):.4f}), "
        f"{toks_per_sec:.1f} tokens/s"
    )
    return 0


def _decode_continuous(
    model, tc, dc, tokenizer, encoder_tokenizer,
    num_hosts, host_id, pred_path, gt_path, logger,
) -> int:
    """Slot-pool decode (inference/continuous*.py): per-request submission
    with immediate refill on completion; host shard by sample index.
    ``num_beams>1`` uses the beam pool (bit-identical to the static
    ``beam_generate``); with ``speculative_ctc`` every pool step verifies a
    CTC-draft window (inference/continuous_spec.py)."""
    import time

    from ps_slm_tpu.data.dataset import Collator, MultiTaskDataset

    speculative = tc.speculative_ctc
    if speculative and encoder_tokenizer is None:
        raise ValueError(
            "speculative_ctc needs the encoder BPE model "
            "(model_config.encoder_path) to decode the CTC draft"
        )
    if speculative and tc.num_beams != 1:
        raise ValueError(
            "speculative_ctc requires num_beams=1 (draft verification is "
            "defined against greedy decode)"
        )

    ds = MultiTaskDataset(
        dc, tokenizer, "test", encoder_tokenizer=encoder_tokenizer,
    )
    coll = Collator(tokenizer, dc, inference_mode=True)
    targets: dict = {}
    stats = {"audio": 0.0, "n": 0}

    def requests():
        from ps_slm_tpu.inference import ctc_draft

        for i, s in enumerate(ds):
            if i % num_hosts != host_id:
                continue
            hb = coll([s])
            jb = {
                k: jnp.asarray(v) for k, v in hb.items()
                if isinstance(v, np.ndarray)
            }
            targets[s.key] = s.target
            stats["audio"] += (
                len(s.waveform) / 16000.0 if s.waveform is not None
                else s.est_frames * 0.060
            )
            stats["n"] += 1
            if speculative:
                draft = ctc_draft(model, jb, encoder_tokenizer, tokenizer)
                yield s.key, (jb, draft, len(draft))
            else:
                yield s.key, jb

    from ps_slm_tpu.inference import make_pool_decoder

    dec = make_pool_decoder(
        model, tc, dc, eos_token_id=tokenizer.eos_token_id
    )
    n_tokens = 0
    t0 = time.perf_counter()
    with open(pred_path, "w") as fpred, open(gt_path, "w") as fgt:
        for key, toks in dec.run(requests()):
            n_tokens += len(toks)
            fpred.write(f"{key}\t{tokenizer.decode(toks)}\n")
            fgt.write(f"{key}\t{targets.pop(key)}\n")
    dt = time.perf_counter() - t0
    rtf_inv = stats["audio"] / max(dt, 1e-9)
    mode = f"continuous{'+spec' if speculative else ''} x{tc.decode_slots}"
    logger.info(
        f"decode done ({stats['n']} utts, {mode}): "
        f"{pred_path}; {rtf_inv:.1f} audio-s/s "
        f"(RTF {1.0 / rtf_inv if rtf_inv else float('inf'):.4f}), "
        f"{n_tokens / max(dt, 1e-9):.1f} tokens/s"
    )
    return 0


def _validate_decode_mode(tc) -> None:
    """Static decode honors all knobs; the pool / draft-verified paths do
    not — reject what they would silently ignore (shared with serve)."""
    if not (tc.continuous_batching or tc.speculative_ctc):
        return
    from ps_slm_tpu.inference import validate_pool_decode_knobs

    mode = "continuous_batching" if tc.continuous_batching else (
        "speculative_ctc"
    )
    validate_pool_decode_knobs(tc, mode)


def _ctc_draft_kwargs(model, jbatch, encoder_tokenizer, tokenizer, window):
    """CTC transcript -> LLM-token draft for speculative greedy decode."""
    from ps_slm_tpu.inference.generate import ctc_transcript_ids

    rows = ctc_transcript_ids(model, model.params, jbatch)
    drafts = [
        tokenizer.encode(encoder_tokenizer.decode(r)) for r in rows
    ]
    # bucket the draft width: it is part of the jit signature of the
    # speculative decode loop, so an exact per-batch max would recompile
    # the whole loop on nearly every batch (draft_lens masks the padding)
    d = max(max((len(x) for x in drafts), default=1), 1)
    d = -(-d // 64) * 64
    ids = np.zeros((len(drafts), d), np.int32)
    lens = np.zeros((len(drafts),), np.int32)
    for i, x in enumerate(drafts):
        ids[i, : len(x)] = x
        lens[i] = len(x)
    return {
        "draft_ids": ids, "draft_lens": lens, "spec_window": window,
    }


def _audio_secs(batch) -> float:
    if "waveform_length" in batch:
        return float(np.sum(batch["waveform_length"])) / 16000.0
    if "input_feature_length" in batch:
        return float(np.sum(batch["input_feature_length"])) * 0.060
    return 0.0


if __name__ == "__main__":
    raise SystemExit(main())
