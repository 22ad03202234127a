"""WER scorer + punctuation cleaner tests."""

import io

import numpy as np

from ps_slm_tpu.tools.clean_marks import clean_text, strip_all_punct
from ps_slm_tpu.tools.wer import (
    Calculator, characterize, default_cluster, score_files, wer_percent,
)


def test_characterize_mixed():
    toks = characterize("hello 世界 it's ok <tag> 123")
    assert toks == ["hello", "世", "界", "it's", "ok", "<tag>", "123"]


def test_characterize_drops_punct():
    assert characterize("a, b! c?") == ["a", "b", "c"]


def test_default_cluster():
    assert default_cluster("hello") == "English"
    assert default_cluster("世") == "Mandarin"
    assert default_cluster("ア") == "Japanese"
    assert default_cluster("한") == "Korean"


def test_calculator_alignment():
    c = Calculator()
    r = c.calculate(list("abcd"), list("abxd"))
    assert (r["cor"], r["sub"], r["del"], r["ins"]) == (3, 1, 0, 0)
    r2 = c.calculate(list("abc"), list("abcd"))
    assert r2["ins"] == 1
    r3 = c.calculate(list("abc"), list("ac"))
    assert r3["del"] == 1


def test_wer_known_value(tmp_path):
    ref = tmp_path / "ref"
    hyp = tmp_path / "hyp"
    ref.write_text("u1\tthe cat sat\nu2\thello world\n")
    hyp.write_text("u1\tthe cat sit\nu2\thello there world\n")
    out = io.StringIO()
    res = score_files(str(ref), str(hyp), verbose=True, stream=out)
    # N=5, S=1 (sat->sit), I=1 (there): WER = 2/5 = 40%
    assert res["all"] == 5
    np.testing.assert_allclose(res["wer"], 40.0)
    assert "Overall" in out.getvalue()
    assert "utt: u1" in out.getvalue()


def test_wer_case_insensitive(tmp_path):
    ref = tmp_path / "ref"
    hyp = tmp_path / "hyp"
    ref.write_text("u1\tHello World\n")
    hyp.write_text("u1\thello world\n")
    res = score_files(str(ref), str(hyp), stream=io.StringIO())
    assert res["wer"] == 0.0


def test_clean_marks(tmp_path):
    assert clean_text("hello, world! 你好。") == "hello world 你好"


def test_clean_marks_matches_reference_cleaner(tmp_path):
    """Fuzz behavior lock vs the reference clean_marks.py (incl. the em dash
    the reference's '——' two-char set entry can never strip)."""
    import random
    import string
    from importlib.machinery import SourceFileLoader

    ref = SourceFileLoader(
        "ref_clean", "/root/reference/Multitask/clean_marks.py"
    ).load_module()
    rng = random.Random(0)
    pool = (
        string.printable + "，。！？：；、（）“”‘’【】《》—…\\"
        + "你好世界アーカ한국" + "​﷐"
    )
    for _ in range(500):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
        want = "".join(ch for ch in s if ref.is_valid_char(ch))
        assert clean_text(s) == want
    assert clean_text("a—b") == "a—b"  # em dash survives, as in the reference
    p = tmp_path / "pred"
    p.write_text("u1\thi, there!\nu2\tok…\n")
    strip_all_punct(str(p))
    assert p.read_text() == "u1\thi there\nu2\tok\n"


def test_wer_tag_strip_ignore_and_split(tmp_path):
    """wenet option parity: --rt default strips <tags>; --ig drops listed
    words; --splitfile expands compounds (wenet_compute_cer.py:48-82)."""
    from ps_slm_tpu.tools.wer import main, normalize, score_files, strip_tags

    assert strip_tags("<noise>") == ""
    assert strip_tags("a<b>c") == "ac"
    assert normalize(["<noise>", "HELLO"], set(), False) == ["HELLO"]
    assert normalize(["hello"], {"HELLO"}, False) == []
    assert normalize(["A-B"], set(), False, {"A-B": ["A", "B"]}) == ["A", "B"]

    ref = tmp_path / "ref"
    hyp = tmp_path / "hyp"
    ref.write_text("u1\thello world\n")
    hyp.write_text("u1\t<noise> hello world\n")
    # tag stripped by default -> perfect score
    import io

    s = io.StringIO()
    r = score_files(str(ref), str(hyp), char=True, stream=s)
    assert r["wer"] == 0.0

    # --rt=0 keeps the tag as an insertion
    s = io.StringIO()
    r = score_files(str(ref), str(hyp), char=True, remove_tag=False, stream=s)
    assert r["ins"] == 1

    # ignore file drops a word from both sides
    ig = tmp_path / "ig"
    ig.write_text("world\n")
    rc = main([f"--ig={ig}", "--char=1", "-v=0", str(ref), str(hyp)])
    assert rc == 0


def test_wer_maxw_padding_and_cluster(tmp_path):
    """Long-tail wenet flags: --maxw wraps alignment lines, --padding-symbol
    pads the narrower token, --cluster= reports per-cluster WER
    (wenet_compute_cer.py:305-378,522-549)."""
    import io

    from ps_slm_tpu.tools.wer import (
        main, read_cluster_file, score_files, width,
    )

    assert width("ab") == 2
    assert width("世界") == 4  # wide chars count two columns

    ref = tmp_path / "ref"
    hyp = tmp_path / "hyp"
    ref.write_text("u1\tone two three four five six\n")
    hyp.write_text("u1\tone too three four five six\n")

    # --maxw=2 wraps the 6-token alignment into 3 lab/rec line pairs
    s = io.StringIO()
    score_files(str(ref), str(hyp), char=False, verbose=True,
                max_words_per_line=2, stream=s)
    out = s.getvalue()
    assert out.count("lab: ") == 3 and out.count("rec: ") == 3

    # underline padding pads the narrower token to the wider one's width
    s = io.StringIO()
    score_files(str(ref), str(hyp), char=False, verbose=True,
                padding_symbol="_", stream=s)
    assert "TOO__" not in s.getvalue()  # hyp token shorter, padded on lab? no:
    assert "TOO " in s.getvalue()
    # ref 'THREE'(5) vs hyp 'THREE'(5): equal; 'TWO'(3) vs 'TOO'(3): equal.
    # Force an uneven pair to see the underline:
    hyp.write_text("u1\tone t three four five six\n")
    s = io.StringIO()
    score_files(str(ref), str(hyp), char=False, verbose=True,
                padding_symbol="_", stream=s)
    assert "T__ " in s.getvalue()  # 'T' padded to width of 'TWO'

    # cluster file: per-cluster WER rows
    cl = tmp_path / "clusters"
    cl.write_text("<Numbers> ONE TWO THREE </Numbers>\n<Rest> FOUR FIVE SIX </Rest>\n")
    assert read_cluster_file(str(cl)) == [
        ("Numbers", ["ONE", "TWO", "THREE"]),
        ("Rest", ["FOUR", "FIVE", "SIX"]),
    ]
    hyp.write_text("u1\tone too three four five six\n")
    s = io.StringIO()
    score_files(str(ref), str(hyp), char=False, cluster_file=str(cl), stream=s)
    out = s.getvalue()
    assert "Numbers -> 33.33 %" in out
    assert "Rest -> 0.00 %" in out

    # CLI plumbs all three flags
    rc = main([f"--cluster={cl}", "--maxw=2", "--padding-symbol=underline",
               "--char=0", "-v=1", str(ref), str(hyp)])
    assert rc == 0


def test_wer_padding_symbol_rejects_unknown(tmp_path):
    """--padding-symbol accepts only 'space'/'underline' — anything else
    (incl. a bare flag) is rc=2, matching the wenet CLI contract
    (wenet_compute_cer.py:376-378)."""
    from ps_slm_tpu.tools.wer import main

    ref = tmp_path / "ref"
    hyp = tmp_path / "hyp"
    ref.write_text("u1\tone two\n")
    hyp.write_text("u1\tone two\n")
    assert main(["--padding-symbol=underscore", str(ref), str(hyp)]) == 2
    assert main(["--padding-symbol", str(ref), str(hyp)]) == 2
    assert main(["--padding-symbol=space", str(ref), str(hyp)]) == 0


def test_read_cluster_file_bracketed_names(tmp_path):
    """Cluster names containing '<', '/', or '>' survive tag stripping:
    exact prefix/suffix removal, not str.strip character sets."""
    from ps_slm_tpu.tools.wer import read_cluster_file

    cl = tmp_path / "clusters"
    cl.write_text("<<x>> A B </<x>>\n")
    assert read_cluster_file(str(cl)) == [("<x>", ["A", "B"])]
