"""In-place punctuation stripper for ``key\\ttext`` decode files.

Equivalent of the reference ``Multitask/clean_marks.py`` (strip CJK+ASCII
punctuation and unprintable characters from the text column before WER
scoring, ``scripts/decode_sensevoice.sh:94-96``).
"""

from __future__ import annotations

import pathlib
import string
import sys
import unicodedata

PUNCT = set(string.punctuation) | {
    "，", "。", "！", "？", "：", "；", "、", "（", "）",
    "“", "”", "‘", "’", "【", "】", "《", "》", "—", "…", "\\",
}


def is_valid_char(ch: str) -> bool:
    try:
        unicodedata.name(ch)
    except ValueError:
        return False
    return ch.isprintable() and ch not in PUNCT


def clean_text(text: str) -> str:
    return "".join(ch for ch in text if is_valid_char(ch))


def strip_all_punct(path: str) -> None:
    p = pathlib.Path(path).expanduser()
    if not p.exists():
        print(f"file does not exist: {p}")
        raise SystemExit(1)
    lines = p.read_text(encoding="utf-8").splitlines()
    out = []
    for line in lines:
        if "\t" not in line:
            out.append(line)
            continue
        key, text = line.split("\t", 1)
        out.append(f"{key}\t{clean_text(text)}")
    p.write_text("\n".join(out) + "\n", encoding="utf-8")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: python -m ps_slm_tpu.tools.clean_marks <file>")
        return 2
    strip_all_punct(argv[0])
    print("cleaned.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
