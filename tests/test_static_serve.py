"""StaticBatchDecoder mechanics (inference/static_serve.py): grouping,
None-flush (live-source protocol), and batch stacking/padding.  The
end-to-end answer parity vs the pool is covered by
tests/test_cli.py::test_serve_cli_static_route."""

from types import SimpleNamespace

import numpy as np

from ps_slm_tpu.inference.static_serve import StaticBatchDecoder, _round_up


def _dec(batch_size=4):
    tc = SimpleNamespace(
        decode_slots=batch_size, num_beams=1, max_new_tokens=8,
        do_sample=False, min_length=1, top_p=1.0, temperature=1.0,
        length_penalty=1.0, repetition_penalty=1.0, kv_cache_bits=16,
    )
    dc = SimpleNamespace(token_bucket=8, feature_bucket=16)
    model = SimpleNamespace(pad_token_id=0)
    return StaticBatchDecoder(model, tc, dc, eos_token_id=2)


def test_round_up():
    assert _round_up(1, 8) == 8
    assert _round_up(8, 8) == 8
    assert _round_up(9, 8) == 16
    assert _round_up(0, 8) == 8


def test_grouping_and_none_flush():
    dec = _dec(batch_size=3)
    calls = []

    def fake_decode(group):
        calls.append([k for k, _ in group])
        for k, _ in group:
            yield k, np.asarray([1], np.int32)

    dec._decode_group = fake_decode

    def source():
        yield "a", {}
        yield "b", {}
        yield None          # live source: nothing ready -> flush partial
        yield "c", {}
        yield "d", {}
        yield "e", {}       # full group -> immediate decode
        yield "f", {}       # trailing partial -> flushed at EOF

    got = [k for k, _ in dec.run(source())]
    assert got == ["a", "b", "c", "d", "e", "f"]
    assert calls == [["a", "b"], ["c", "d", "e"], ["f"]]


def test_stack_pads_left_ids_and_replicates_rows():
    dec = _dec(batch_size=4)
    g1 = {
        "input_ids": np.asarray([[5, 6, 7]], np.int32),
        "attention_mask": np.ones((1, 3), bool),
        "input_features": np.ones((1, 10, 4), np.float32),
        "input_feature_length": np.asarray([10], np.int32),
    }
    g2 = {
        "input_ids": np.asarray([[8, 9]], np.int32),
        "attention_mask": np.ones((1, 2), bool),
        "input_features": np.ones((1, 20, 4), np.float32) * 2,
        "input_feature_length": np.asarray([20], np.int32),
    }
    dec.model.params = {"llm": {"embed_tokens": np.zeros((4, 4), np.float32)}}
    batch, n = dec._stack([("k1", g1), ("k2", g2)])
    assert n == 2
    # token axis rounded to token_bucket=8, batch axis padded to 4 by
    # replicating real samples
    assert batch["input_ids"].shape == (4, 8)
    assert batch["attention_mask"].shape == (4, 8)
    # LEFT padding: content at the right edge
    np.testing.assert_array_equal(batch["input_ids"][0, -3:], [5, 6, 7])
    assert not batch["attention_mask"][0, :5].any()
    np.testing.assert_array_equal(batch["input_ids"][1, -2:], [8, 9])
    # replicated pad rows are copies of the real ones (k1, k2 cycle)
    np.testing.assert_array_equal(batch["input_ids"][2], batch["input_ids"][0])
    np.testing.assert_array_equal(batch["input_ids"][3], batch["input_ids"][1])
    # features right-padded to feature_bucket multiple
    assert batch["input_features"].shape == (4, 32, 4)
    np.testing.assert_array_equal(
        batch["input_feature_length"], [10, 20, 10, 20]
    )


def test_mixed_payload_group_partitioned():
    """A group mixing 'input_features' and 'waveform' payloads is split by
    payload kind before stacking — _stack's features branch indexes every
    member, so a mixed batch would KeyError otherwise."""
    dec = _dec(batch_size=4)
    seen = []

    def fake_uniform(group):
        kinds = {StaticBatchDecoder._payload_kind(g) for _, g in group}
        assert len(kinds) == 1
        seen.append((sorted(k for k, _ in group), kinds.pop()))
        for k, _ in group:
            yield k, np.asarray([1], np.int32)

    dec._decode_uniform = fake_uniform
    group = [
        ("f1", {"input_features": np.ones((1, 4, 2), np.float32)}),
        ("w1", {"waveform": np.ones((1, 16), np.float32)}),
        ("f2", {"input_features": np.ones((1, 4, 2), np.float32)}),
    ]
    got = sorted(k for k, _ in dec._decode_group(group))
    assert got == ["f1", "f2", "w1"]
    assert (["f1", "f2"], "input_features") in seen
    assert (["w1"], "waveform") in seen
