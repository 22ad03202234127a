"""Typed configuration system with Hydra-style CLI overrides.

Capability parity with the reference config layer
(``Multitask/aispeech_asr_config.py:26-181`` + Hydra ``++section.key=value``
merging in ``Multitask/finetune_deepspeed.py:40-54``), re-implemented without
Hydra: plain dataclasses + a small override parser.  Every TASU switch of the
reference ``TrainConfig`` (``aispeech_asr_config.py:66-121``) is preserved so
recipes translate 1:1.

Extension points that the reference expressed as ``file="module.py:function"``
strings (``aispeech_asr_config.py:28,126``) are expressed here as registry
names resolved via :mod:`ps_slm_tpu.registry`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, List, Optional


@dataclass
class PeftConfig:
    """LoRA settings (reference ``aispeech_asr_config.py:41-50``)."""

    peft_method: str = "lora"
    r: int = 64
    lora_alpha: int = 16
    target_modules: List[str] = field(
        default_factory=lambda: [
            "q_proj", "k_proj", "v_proj", "o_proj",
            "up_proj", "gate_proj", "down_proj",
        ]
    )
    bias: str = "none"
    task_type: str = "CAUSAL_LM"
    lora_dropout: float = 0.05
    inference_mode: bool = False
    # prefix-tuning only (peft_method="prefix"; reference dispatch at
    # utils/config_utils.py:43-58 -> peft.PrefixTuningConfig)
    num_virtual_tokens: int = 30
    # llama-adapter only (peft_method="llama_adapter"; reference dispatch
    # -> peft.AdaptionPromptConfig): length of the learned adaption prompt
    # and how many of the TOP decoder layers carry one
    adapter_len: int = 10
    adapter_layers: int = 30


@dataclass
class FbankConfig:
    """Kaldi-convention fbank front end (reference ``aispeech_asr_config.py:53-63``)."""

    num_mel_bins: int = 80
    frame_length: int = 25          # ms
    frame_shift: int = 10           # ms
    dither: float = 0.001
    window_type: str = "hamming"
    use_energy: bool = False
    low_freq: int = 0
    high_freq: int = 8000
    htk_compat: bool = True
    sample_rate: int = 16000
    # LFR stacking (funasr WavFrontend defaults: m=7 stack, n=6 shift -> 560-dim)
    lfr_m: int = 7
    lfr_n: int = 6
    cmvn_path: Optional[str] = None  # am.mvn global CMVN stats
    # SpecAugment on the LFR features during training.  Default off: the
    # reference carries the capability but comments the call out
    # (SenseVoice.py:724-725); enable with ++dataset_config.fbank.specaug=true.
    specaug: bool = False
    specaug_t_masks: int = 2
    specaug_t_width: int = 50
    specaug_f_masks: int = 2
    specaug_f_width: int = 10


@dataclass
class ModelConfig:
    """Reference ``aispeech_asr_config.py:26-39`` (registry instead of file paths)."""

    factory: str = "tasu"           # registry name replacing file="model/ps-slm.py:model_factory"
    llm_name: str = "Qwen2.5-1.5B-Instruct"
    llm_path: str = ""
    llm_type: str = "decoder_only"
    llm_dim: int = 1536
    encoder_name: str = "sensevoice"
    encoder_path: Optional[str] = None
    encoder_dim: int = 512
    encoder_projector: str = "linear-silu"
    encoder_projector_ds_rate: int = 1
    ctc_linear: Optional[str] = None   # pretrained ctc_head for simple_linear (ps-slm.py:64-85)
    # encoder BPE model directory when it does not live next to the encoder
    # weights (default: encoder_path, matching the reference's tokenizer
    # lookup in model/tokenizer.py:5-29)
    encoder_bpe_path: Optional[str] = None
    qformer_layers: int = 8
    qformer_heads: int = 12     # static head count (NOT a param leaf)
    query_len: int = 64
    ca_heads: int = 8           # cross-attention projector heads (projector.py:104)
    # Tiny-model overrides for tests / CI (None = read from checkpoint config)
    llm_config_overrides: Optional[dict] = None
    encoder_config_overrides: Optional[dict] = None


@dataclass
class TrainConfig:
    """All TASU switches of the reference ``aispeech_asr_config.py:66-121``."""

    model_name: str = "asr_model"
    run_validation: bool = True
    batch_size_training: Optional[int] = None
    batching_strategy: str = "dynamic"    # "dynamic" token-budget | "padding" fixed batch
    context_length: int = 4096
    gradient_accumulation_steps: int = 1
    num_epochs: int = 3
    num_workers_dataloader: int = 1
    warmup_steps: int = 200               # conf/ds_config.json:24-26
    total_steps: int = 15000
    validation_interval: int = 1000
    lr: float = 5e-5                      # conf/ds_config.json:7
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-6
    weight_decay: float = 0.0
    gamma: float = 0.85
    seed: int = 42
    mixed_precision: bool = True          # bf16 compute, fp32 LN/optimizer
    val_batch_size: Optional[int] = None
    # --- TASU algorithm switches (behavioral spec §2.B of SURVEY.md) ---
    do_psd: bool = False
    ctc_posterior: bool = False
    voca_trans: bool = False
    use_peft: bool = False
    use_emb: bool = False                 # un-freeze embed_tokens under PEFT
    gt_emb: bool = False
    gt_emb_noise: bool = False
    top1_emb: bool = False
    cross_attn: bool = False
    gaussian_sim: bool = False
    # CPS-noise knobs (reference hard-codes at ps-slm.py:372-375)
    drop_prob: float = 0.05
    insert_prob: float = 0.0
    smooth_low: float = 0.0
    smooth_high: float = 0.1
    # blank id used by voca_trans+do_psd in training forward (ps-slm.py:491)
    voca_trans_blank_id: int = 151643
    # --- freezing ---
    freeze_llm: bool = False
    freeze_encoder: bool = False
    freeze_projector: bool = False
    freeze_layers: bool = False
    num_freeze_layers: int = 1
    # --- misc ---
    peft_config: PeftConfig = field(default_factory=PeftConfig)
    output_dir: str = "out"
    quantization: bool = False
    # weight-only bit width when quantization=true: 8 (reference
    # load_in_8bit parity) or 4 (beyond reference: group-wise int4, s4
    # HBM storage — models/quantization.py)
    quant_bits: int = 8
    q4_group_size: int = 128              # contraction-group size for int4 scales
    save_model: bool = True
    # unconditional end-of-training checkpoint ("last/"): the reference only
    # saves on validation improvement (deepspeed_utils.py:256-260), which
    # can leave a long run with no final artifact; save_last guarantees one
    save_last: bool = False
    resume_from: Optional[str] = None
    device: Optional[int] = 0
    # --- parallelism (TPU-native; replaces ds_config.json ZeRO-2 semantics) ---
    mesh_shape: Optional[dict] = None     # e.g. {"data": 4, "fsdp": 2} (+ "tensor"/"pipe"); None = all "data"
    fsdp_min_size: int = 2 ** 16          # only shard params at least this big
    pp_microbatches: int = 0              # GPipe microbatches when mesh has pipe>1 (0 = 2 x stages)
    remat: bool = False                   # jax.checkpoint on transformer blocks
    # decode settings (HF generate kwargs surface, ps-slm.py:660-675)
    max_new_tokens: int = 200
    num_beams: int = 4
    do_sample: bool = False
    min_length: int = 1
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    temperature: float = 1.0
    # continuous (slot-pool) batch decode — greedy only; finished slots are
    # refilled immediately instead of waiting for the batch's longest
    # sequence (inference/continuous.py)
    continuous_batching: bool = False
    decode_slots: int = 8
    decode_sync_every: int = 8
    # KV-cache storage width for all decode paths: 16 = bf16 (exact), 8 =
    # per-vector int8 (half the cache HBM traffic / double slot capacity;
    # output may differ within quantization noise)
    kv_cache_bits: int = 16
    # cli/serve.py: also emit {"key", "partial": true, "text"} lines with
    # the text decoded so far at every pool harvest (greedy/spec pools)
    stream_partials: bool = False
    # cli/serve.py request routing: "auto" probes the first route_probe
    # completions through the slot pool and switches to static batching
    # (inference/static_serve.py) when the median completion is under
    # route_static_below tokens (static wins ~4x on short answers,
    # docs/PERF.md); "pool"/"static" force one path.  Streaming and
    # speculative serving always use the pool.
    serve_route: str = "auto"
    route_probe: int = 16
    route_static_below: int = 32
    # CTC-draft speculative decoding (greedy only): the CTC transcript is
    # verified in windows, output bit-identical (inference/speculative.py)
    speculative_ctc: bool = False
    spec_window: int = 8


@dataclass
class DataConfig:
    """Reference ``aispeech_asr_config.py:124-158``."""

    factory: str = "multitask"            # registry name replacing file="dataset/...:get_speech_dataset"
    dataset: str = "multitask_dataset"
    encoder: str = "sensevoice"
    encoder_path: Optional[str] = None
    max_audio_length: int = 30            # seconds; filter window 0.1s-30s (speech_dataset_large.py:111)
    train_max_frame_length: int = 1500
    ds_rate: int = 8
    eval_max_frame_length: int = 2000
    multitask_prompt_path: str = "conf/multiprompt.jsonl"
    prompt_style: str = "<|im_start|>user\n{}<speech><|im_end|>\n<|im_start|>assistant\n"
    append_info_tasks: List[str] = field(default_factory=lambda: ["hotword"])
    train_scp_file_path: str = ""
    dev_scp_file_path: str = ""
    test_scp_file_path: str = ""
    train_split: str = "train"
    dev_split: str = "dev"
    test_split: str = "test"
    inference_mode: bool = False
    lower: bool = False
    fix_length_audio: int = -1
    fbank: FbankConfig = field(default_factory=FbankConfig)
    normalize: bool = False
    # Bucketing for static XLA shapes: feature lengths are padded up to the
    # nearest multiple of `feature_bucket`; token lengths to `token_bucket`.
    feature_bucket: int = 128
    token_bucket: int = 32
    # Wire format for host->device waveforms: "int16" (half the transfer
    # bytes; exact for 16-bit PCM sources) or "float32".
    waveform_dtype: str = "int16"


@dataclass
class LogConfig:
    """Reference ``aispeech_asr_config.py:173-181`` (wandb optional/stubbed)."""

    use_wandb: bool = False
    wandb_dir: str = "tmp/wandb"
    wandb_entity_name: str = "project_name"
    wandb_project_name: str = "project_name"
    wandb_exp_name: str = "exp_name"
    log_file: str = "tmp/train.log"
    log_interval: int = 5
    profile_dir: Optional[str] = None     # jax.profiler trace output


@dataclass
class RunConfig:
    """Top-level bundle mirroring the reference ``RunConfig``
    (``finetune_deepspeed.py:19-37``)."""

    model_config: ModelConfig = field(default_factory=ModelConfig)
    train_config: TrainConfig = field(default_factory=TrainConfig)
    dataset_config: DataConfig = field(default_factory=DataConfig)
    log_config: LogConfig = field(default_factory=LogConfig)
    ckpt_path: Optional[str] = None
    peft_ckpt: Optional[str] = None
    decode_log: str = "decode"
    debug: bool = False


# ----------------------------------------------------------------------------
# CLI override parsing: ``++train_config.lr=1e-4`` / ``train_config.lr=1e-4``
# ----------------------------------------------------------------------------

def _coerce(value: str, current: Any) -> Any:
    """Coerce a CLI string to the type of the current field value."""
    if isinstance(current, bool) or value.lower() in ("true", "false"):
        return value.lower() == "true"
    if value.lower() in ("none", "null"):
        return None
    if isinstance(current, int) and not isinstance(current, bool):
        try:
            return int(value)
        except ValueError:
            return float(value)
    if isinstance(current, float):
        return float(value)
    if value and (
        isinstance(current, (list, dict))
        or (value[0] in "[{" and value[-1] in "]}")
    ):
        return json.loads(value)
    # ints/floats for untyped (None-default) fields
    for caster in (int, float):
        try:
            return caster(value)
        except ValueError:
            pass
    return value


def apply_override(cfg: Any, dotted_key: str, value: str) -> None:
    """Set ``a.b.c=value`` on a nested dataclass tree (in place)."""
    parts = dotted_key.split(".")
    obj = cfg
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise KeyError(f"unknown config section: {dotted_key!r} (no {p!r})")
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise KeyError(f"unknown config key: {dotted_key!r}")
    current = getattr(obj, leaf)
    setattr(obj, leaf, _coerce(value, current))


def parse_cli(argv: List[str], cfg: Optional[RunConfig] = None) -> RunConfig:
    """Parse ``[++]key.path=value`` overrides into a RunConfig.

    Mirrors the reference's Hydra override ergonomics
    (``scripts/finetune_deespeed_sensevoice.sh:25-45``).
    A bare ``--config foo.json`` argument loads a JSON config first.
    """
    cfg = cfg or RunConfig()
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg in ("--config", "-c"):
            i += 1
            with open(argv[i]) as f:
                merge_dict(cfg, json.load(f))
        elif "=" in arg:
            key, _, value = arg.partition("=")
            key = key.lstrip("+").lstrip("-")
            apply_override(cfg, key, value)
        elif arg.startswith("--local_rank"):
            pass  # launcher compatibility shim (deepspeed_utils.py:39-99 parity)
        else:
            raise SystemExit(f"unrecognized argument: {arg!r}")
        i += 1
    return cfg


def merge_dict(cfg: Any, overrides: dict) -> Any:
    """Recursively merge a plain dict into a dataclass tree."""
    for k, v in overrides.items():
        if not hasattr(cfg, k):
            raise KeyError(f"unknown config key {k!r} on {type(cfg).__name__}")
        cur = getattr(cfg, k)
        if is_dataclass(cur) and isinstance(v, dict):
            merge_dict(cur, v)
        else:
            setattr(cfg, k, v)
    return cfg


def to_dict(cfg: Any) -> Any:
    """Dataclass tree -> plain dict (for logging / run dumps, like Hydra's
    resolved ``.hydra/config.yaml``)."""
    if is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def dump(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2, default=str)
