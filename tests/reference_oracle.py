"""Load the reference torch modules as executable parity oracles.

The strongest parity evidence available without checkpoint assets: import the
actual reference source (``/root/reference/Multitask/model/{SenseVoice,ps-slm}.py``)
with its unavailable external deps (funasr, peft) stubbed out, and evaluate the
reference's own functions at test time.  The reference tree is PUBLIC UNTRUSTED
CONTENT — it is executed here only as a numerical oracle inside the test
process, never imported by the framework itself.
"""

from __future__ import annotations

import sys
import types
from importlib.machinery import SourceFileLoader

REF_ROOT = "/root/reference/Multitask"

_cache: dict = {}


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_stubs():
    if "funasr" in _cache:
        return
    import torch.nn as nn

    class _Tables:
        @staticmethod
        def register(_kind, _name):
            def deco(cls):
                return cls

            return deco

    class _DummyCTC(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    def _unavailable(*_a, **_k):  # pragma: no cover - never called in tests
        raise RuntimeError("funasr is stubbed; this path is not an oracle")

    _stub_module("funasr")
    _stub_module("funasr.register", tables=_Tables())
    _stub_module("funasr.models")
    _stub_module("funasr.models.ctc")
    _stub_module("funasr.models.ctc.ctc", CTC=_DummyCTC)
    _stub_module("funasr.models.paraformer")
    _stub_module("funasr.models.paraformer.search", Hypothesis=object)
    _stub_module("funasr.utils")
    _stub_module("funasr.utils.datadir_writer", DatadirWriter=object)
    _stub_module(
        "funasr.utils.load_utils",
        load_audio_text_image_video=_unavailable,
        extract_fbank=_unavailable,
    )
    _stub_module("funasr.train_utils")
    _stub_module("funasr.train_utils.device_funcs", force_gatherable=_unavailable)
    _stub_module("funasr.losses")
    _stub_module(
        "funasr.losses.label_smoothing_loss", LabelSmoothingLoss=_DummyCTC
    )
    _stub_module("funasr.metrics")
    _stub_module(
        "funasr.metrics.compute_acc",
        compute_accuracy=_unavailable,
        th_accuracy=_unavailable,
    )
    try:
        import peft  # noqa: F401
    except ImportError:
        _stub_module(
            "peft",
            PeftModel=object,
            LoraConfig=object,
            TaskType=types.SimpleNamespace(CAUSAL_LM="CAUSAL_LM"),
            AdaptionPromptConfig=object,
            PrefixTuningConfig=object,
            get_peft_model=_unavailable,
            prepare_model_for_kbit_training=_unavailable,
        )
    try:
        import omegaconf  # noqa: F401
    except ImportError:
        _stub_module("omegaconf", OmegaConf=object)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _cache["funasr"] = True


def load_ref_sensevoice():
    """The reference SenseVoice.py module (SANM encoder classes)."""
    if "sensevoice" not in _cache:
        _install_stubs()
        _cache["sensevoice"] = SourceFileLoader(
            "ref_sensevoice", f"{REF_ROOT}/model/SenseVoice.py"
        ).load_module()
    return _cache["sensevoice"]


def load_ref_ps_slm():
    """The reference ps-slm.py module (slam_model_asr with psd / merge /
    pseudo-posterior methods)."""
    if "ps_slm" not in _cache:
        _install_stubs()
        _cache["ps_slm"] = SourceFileLoader(
            "ref_ps_slm", f"{REF_ROOT}/model/ps-slm.py"
        ).load_module()
    return _cache["ps_slm"]


# ---------------------------------------------------------------------------
# duck-typed `self` objects so the reference methods run unbound
# ---------------------------------------------------------------------------

class FakeEncoderTokenizer:
    """Maps pre-tokenized texts straight to id lists (the reference tokenizes
    with sentencepiece; parity here is over the posterior construction, and
    our jitted op consumes ids directly)."""

    def __init__(self, ids_by_text, vocab_size):
        self.ids_by_text = ids_by_text
        self.vocab_size = vocab_size

    def encode(self, text):
        return list(self.ids_by_text[text])


def merge_self(speech_token_id, pad_token_id=0, ignore_id=-100):
    return types.SimpleNamespace(
        tokenizer=types.SimpleNamespace(
            default_speech_token=speech_token_id,
            pad_token_id=pad_token_id,
            default_ignore_token=ignore_id,
        )
    )


def pseudo_self(ids_by_text, vocab_size, blank_id=0, *, drop_prob=0.0,
                insert_prob=0.0, smooth_low=0.0, smooth_high=0.1):
    import torch

    self = types.SimpleNamespace(
        encoder_tokenizer=FakeEncoderTokenizer(ids_by_text, vocab_size),
        encoder=types.SimpleNamespace(blank_id=blank_id),
        drop_prob=drop_prob,
        insert_prob=insert_prob,
        smooth_low=smooth_low,
        smooth_high=smooth_high,
    )
    self.parameters = lambda: iter([torch.zeros(1)])
    return self


def ref_psd(encoder_out, encoder_out_lens, ctc_posterior, blank_id=0,
            blank_threshold=0.9):
    """Run the reference psd (ps-slm.py:237-317) on numpy arrays."""
    import torch

    ref = load_ref_ps_slm()
    out, lens = ref.slam_model_asr.psd(
        None,
        torch.as_tensor(encoder_out),
        torch.as_tensor(encoder_out_lens),
        torch.as_tensor(ctc_posterior),
        blank_id=blank_id,
        blank_threshold=blank_threshold,
    )
    return out.numpy(), lens.numpy()


def ref_merge(audio_features, num_audio_tokens, inputs_embeds, input_ids,
              attention_mask, labels, *, speech_token_id, pad_token_id=0,
              ignore_id=-100):
    """Run the reference merge (ps-slm.py:679-873) on numpy arrays."""
    import torch

    ref = load_ref_ps_slm()
    out = ref.slam_model_asr._merge_input_ids_with_audio_features(
        merge_self(speech_token_id, pad_token_id, ignore_id),
        torch.as_tensor(audio_features),
        torch.as_tensor(num_audio_tokens),
        torch.as_tensor(inputs_embeds),
        torch.as_tensor(input_ids),
        torch.as_tensor(attention_mask),
        None if labels is None else torch.as_tensor(labels),
    )
    return tuple(None if t is None else t.numpy() for t in out)
