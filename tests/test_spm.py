"""SentencePiece-compatible BPE: proto round-trip, encode semantics,
native C++ vs Python equivalence."""

import numpy as np
import pytest

from ps_slm_tpu.data import spm


def _tiny_model():
    """BPE vocab: specials, then pieces with merge scores."""
    pieces = [
        ("<blank>", 0.0, spm.TYPE_CONTROL),   # id 0 = blank (SenseVoice)
        ("<unk>", 0.0, spm.TYPE_UNKNOWN),
        ("</s>", 0.0, spm.TYPE_CONTROL),
        ("▁", -10.0, spm.TYPE_NORMAL),
        ("a", -1.0, spm.TYPE_NORMAL),
        ("b", -2.0, spm.TYPE_NORMAL),
        ("c", -3.0, spm.TYPE_NORMAL),
        ("ab", -0.5, spm.TYPE_NORMAL),
        ("▁a", -0.4, spm.TYPE_NORMAL),
        ("▁ab", -0.3, spm.TYPE_NORMAL),
        ("abc", -0.2, spm.TYPE_NORMAL),
    ]
    # byte fallback pieces
    for b in range(256):
        pieces.append((f"<0x{b:02X}>", -20.0, spm.TYPE_BYTE))
    return spm.serialize_model_proto(pieces), pieces


def test_proto_roundtrip():
    blob, pieces = _tiny_model()
    parsed = spm.parse_model_proto(blob)
    assert len(parsed) == len(pieces)
    for (p1, s1, t1), (p2, s2, t2) in zip(parsed, pieces):
        assert p1 == p2 and t1 == t2
        np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_bpe_merge_order(tmp_path):
    blob, _ = _tiny_model()
    f = tmp_path / "m.model"
    f.write_bytes(blob)
    sp = spm.SentencePieceBPE(str(f))
    # "ab" merges: ▁+a -> ▁a (score -0.4) vs a+b -> ab (-0.5): ▁a wins first,
    # then ▁a+b -> ▁ab (-0.3): result [▁ab]
    assert [sp.id_to_piece(i) for i in sp.encode("ab")] == ["▁ab"]
    # "abc": ▁a, then ▁ab, then ▁ab+c has no piece -> [▁ab, c]
    assert [sp.id_to_piece(i) for i in sp.encode("abc")] == ["▁ab", "c"]
    # two words
    assert [sp.id_to_piece(i) for i in sp.encode("ab ab")] == ["▁ab", "▁ab"]


def test_byte_fallback(tmp_path):
    blob, _ = _tiny_model()
    f = tmp_path / "m.model"
    f.write_bytes(blob)
    sp = spm.SentencePieceBPE(str(f))
    ids = sp.encode("aXb")
    pieces = [sp.id_to_piece(i) for i in ids]
    # "X" (0x58) has no piece -> byte fallback inside the word
    assert "<0x58>" in pieces


def test_decode_roundtrip(tmp_path):
    blob, _ = _tiny_model()
    f = tmp_path / "m.model"
    f.write_bytes(blob)
    sp = spm.SentencePieceBPE(str(f))
    assert sp.decode(sp.encode("ab abc")) == "ab abc"


def test_native_matches_python(tmp_path):
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "build", "libps_native.so")
    if not os.path.exists(so):
        pytest.skip("native lib not built")
    blob, _ = _tiny_model()
    f = tmp_path / "m.model"
    f.write_bytes(blob)
    py = spm.SentencePieceBPE(str(f))
    nat = spm.load_bpe(str(f), prefer_native=True)
    assert isinstance(nat, spm._NativeSPM), "native loader not used"
    assert nat.vocab_size == py.vocab_size
    for text in ["ab", "abc", "ab ab", "aXb", "", "a b c", "cab cba"]:
        assert nat.encode(text) == py.encode(text), text
