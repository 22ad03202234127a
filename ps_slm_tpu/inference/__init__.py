"""Inference runtime: bucketed KV-cache decoding, batch decode."""


def validate_pool_decode_knobs(tc, mode: str) -> None:
    """The slot pools and the draft-verified path implement plain greedy /
    beam only; reject knobs they would silently ignore (the static path
    honors repetition_penalty/sampling/min_length — inference/generate.py).
    Shared by cli/decode.py and cli/serve.py so both entries fail the same
    way instead of streaming silently-different output."""
    if tc.repetition_penalty != 1.0:
        raise ValueError(
            f"{mode} does not apply repetition_penalty; unset it or use "
            "the static decode path"
        )
    if tc.do_sample:
        raise ValueError(
            f"{mode} does not sample; unset do_sample or use the static "
            "decode path"
        )
    if tc.min_length > 1:
        raise ValueError(
            f"{mode} does not apply min_length; use the static decode path"
        )
    if tc.speculative_ctc and tc.spec_window < 2:
        raise ValueError(
            "spec_window must be >= 2 (a 1-token window has no draft "
            "tokens to verify — use plain greedy instead)"
        )
    if tc.speculative_ctc and tc.num_beams != 1:
        raise ValueError(
            "speculative_ctc requires num_beams=1 (draft verification is "
            "defined against greedy decode)"
        )
    if getattr(tc, "stream_partials", False) and tc.num_beams != 1:
        raise ValueError(
            "stream_partials requires num_beams=1 — beam hypotheses have "
            "no stable prefix until finalization"
        )


def make_pool_decoder(model, tc, dc, *, eos_token_id: int):
    """Slot-pool decoder selected by the decode knobs (speculative_ctc >
    num_beams>1 > greedy).  Shared by cli/decode.py and cli/serve.py so
    pool construction — including the spec-pool sync_every heuristic —
    cannot drift between the two entries."""
    common = dict(
        num_slots=tc.decode_slots,
        prefill_len=dc.eval_max_frame_length,
        max_new_tokens=tc.max_new_tokens,
        eos_token_id=eos_token_id,
        kv_bits=getattr(tc, "kv_cache_bits", 16),
    )
    if tc.speculative_ctc:
        from ps_slm_tpu.inference.continuous_spec import (
            ContinuousSpeculativeDecoder,
        )

        return ContinuousSpeculativeDecoder(
            model, model.params, window=tc.spec_window,
            sync_every=max(tc.decode_sync_every // tc.spec_window, 2),
            **common,
        )
    if tc.num_beams > 1:
        from ps_slm_tpu.inference.continuous_beam import ContinuousBeamDecoder

        return ContinuousBeamDecoder(
            model, model.params, num_beams=tc.num_beams,
            length_penalty=tc.length_penalty,
            sync_every=tc.decode_sync_every, **common,
        )
    from ps_slm_tpu.inference.continuous import ContinuousGreedyDecoder

    return ContinuousGreedyDecoder(
        model, model.params, sync_every=tc.decode_sync_every, **common,
    )


def ctc_draft(model, jbatch, encoder_tokenizer, tokenizer):
    """Single-request CTC draft re-tokenized into the LLM vocab (the
    speculative pools' draft source; shared by cli/decode.py and
    cli/serve.py)."""
    from ps_slm_tpu.inference.generate import ctc_transcript_ids

    (row,) = ctc_transcript_ids(model, model.params, jbatch)
    return tokenizer.encode(encoder_tokenizer.decode(row))
