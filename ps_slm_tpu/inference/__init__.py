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
