"""LLM-side tokenizer wrappers.

The reference uses HF ``AutoTokenizer`` with an added ``<speech>`` special
token and pad=eos (``ps-slm.py:25-28,132-140``).  ``HFTokenizer`` reproduces
that; ``StubTokenizer`` is a dependency-free whitespace tokenizer with the
same interface for tests and smoke runs.
"""

from __future__ import annotations

import zlib
from typing import List, Optional

DEFAULT_SPEECH_TOKEN = "<speech>"
DEFAULT_IGNORE_TOKEN = -100


class HFTokenizer:
    """transformers-backed tokenizer with the <speech> special token."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path)
        self.tok.add_special_tokens(
            {"additional_special_tokens": [DEFAULT_SPEECH_TOKEN]}
        )
        if self.tok.pad_token_id is None:
            self.tok.pad_token = self.tok.eos_token
        self.speech_token_id = self.tok.convert_tokens_to_ids(
            DEFAULT_SPEECH_TOKEN
        )
        self.eos_token_id = self.tok.eos_token_id
        self.pad_token_id = self.tok.eos_token_id  # reference: pad = eos
        self.bos_token_id = self.tok.bos_token_id
        self.default_ignore_token = DEFAULT_IGNORE_TOKEN

    @property
    def vocab_size(self) -> int:
        return len(self.tok)

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tok.decode(
            ids, skip_special_tokens=skip_special_tokens,
            clean_up_tokenization_spaces=True,
        )

    def batch_decode(self, idss, skip_special_tokens: bool = True):
        return [self.decode(ids, skip_special_tokens) for ids in idss]


class OwnBPETokenizer:
    """Own byte-level BPE (data/bbpe.py) behind the HFTokenizer interface.

    Used for GPT-2-style checkpoints (vocab.json + merges.txt — Qwen2/2.5
    included) without the Rust wheel; token-for-token equality with the
    ``tokenizers`` library is pinned in tests/test_bbpe.py.
    """

    def __init__(self, path: str):
        import json
        import os

        from ps_slm_tpu.data.bbpe import ByteLevelBPE

        self.tok = ByteLevelBPE.from_pretrained(path)
        eos = "<|endoftext|>"
        cfg_path = os.path.join(path, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path, encoding="utf-8") as f:
                cfg = json.load(f)
            t = cfg.get("eos_token")
            if isinstance(t, dict):
                t = t.get("content")
            if t:
                eos = t
        self.tok.add_special_tokens([eos, DEFAULT_SPEECH_TOKEN])
        self.speech_token_id = self.tok.special_tokens[DEFAULT_SPEECH_TOKEN]
        self.eos_token_id = self.tok.special_tokens[eos]
        self.pad_token_id = self.eos_token_id  # reference: pad = eos
        self.bos_token_id = None
        self.default_ignore_token = DEFAULT_IGNORE_TOKEN

    @property
    def vocab_size(self) -> int:
        return self.tok.vocab_size

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tok.decode(ids, skip_special_tokens)

    def batch_decode(self, idss, skip_special_tokens: bool = True):
        return [self.decode(ids, skip_special_tokens) for ids in idss]


class StubTokenizer:
    """Whitespace tokenizer over a fixed-size hashed vocab (tests only).

    Hashing must be stable across processes: Python's ``hash()`` is
    salted per interpreter (PYTHONHASHSEED), which would hand every
    ``jax.distributed`` process a DIFFERENT word->id map and break the
    multi-process == single-process training equality
    (tests/test_multihost.py) — hence crc32."""

    def __init__(self, vocab_size: int = 256):
        self._vocab = vocab_size
        self.eos_token_id = vocab_size - 1
        self.pad_token_id = vocab_size - 1
        self.bos_token_id = None
        self.speech_token_id = vocab_size - 2
        self.default_ignore_token = DEFAULT_IGNORE_TOKEN
        self._decode_memory = {}

    @property
    def vocab_size(self) -> int:
        return self._vocab

    def encode(self, text: str) -> List[int]:
        out = []
        for word in text.replace(DEFAULT_SPEECH_TOKEN, " \x00 ").split():
            if word == "\x00":
                out.append(self.speech_token_id)
            else:
                i = (zlib.crc32(word.encode("utf-8")) % (self._vocab - 3)) + 1
                self._decode_memory[i] = word
                out.append(i)
        return out

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        words = []
        for i in ids:
            i = int(i)
            if i in (self.pad_token_id, self.speech_token_id) or i < 0:
                continue
            words.append(self._decode_memory.get(i, f"<{i}>"))
        return " ".join(words)

    def batch_decode(self, idss, skip_special_tokens: bool = True):
        return [self.decode(ids) for ids in idss]


def load_tokenizer(path: Optional[str], vocab_size: int = 256):
    """Own byte-level BPE for vocab.json/merges.txt checkpoints whose
    pre-tokenization we implement (Qwen2/2.5 and classic GPT-2 — selected
    from ``tokenizer_class``); the transformers wheel for everything else —
    or always, with PS_USE_HF_TOKENIZER=1 (optional fast path)."""
    import json
    import os

    if path:
        if (
            os.environ.get("PS_USE_HF_TOKENIZER") != "1"
            and os.path.exists(os.path.join(path, "vocab.json"))
            and os.path.exists(os.path.join(path, "merges.txt"))
        ):
            klass = ""
            cfg_path = os.path.join(path, "tokenizer_config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path, encoding="utf-8") as f:
                    klass = str(json.load(f).get("tokenizer_class", ""))
            # unknown classes may pre-tokenize differently (e.g. Llama's
            # digit handling) — those go to the wheel, not a silent guess
            if not klass or klass.startswith(("Qwen2", "GPT2")):
                return OwnBPETokenizer(path)
        return HFTokenizer(path)
    return StubTokenizer(vocab_size)
