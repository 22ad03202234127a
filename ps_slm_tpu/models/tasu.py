"""TASU composite model: encoder + projector + LLM, all algorithm variants.

This is the TPU-native re-design of ``slam_model_asr``
(``Multitask/model/ps-slm.py:183-677``).  The flag-driven branch tree of
``forward`` (behavioral spec SURVEY.md §2.B) is reproduced with *static*
Python flags resolved at trace time, so each configuration jits to a single
straight-line program:

  1. query prepend + encoder + CTC softmax + slice-4   ps-slm.py:430-454
     (skipped entirely in text-only mode, where the reference computes and
     discards it — same semantics, no wasted FLOPs)
  2. text-only TASU (gt_emb / gt_emb_noise)            ps-slm.py:459-468
  3. audio TASU posterior (+ optional PSD)             ps-slm.py:469-473
  4. cross-attention projector                         ps-slm.py:475-480
  5. voca_trans (LegoSLM) soft/top-1 embedding mix     ps-slm.py:485-514
  6. raw-feature SLAM-ASR baseline                     ps-slm.py:515-523
  7. merge into the token stream                       ps-slm.py:679-873
  8. CE loss + masked token accuracy                   ps-slm.py:530-535

Randomness (CPS noise) is explicit `jax.random` keys instead of implicit
host-side torch RNG.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ps_slm_tpu.models import qwen2, sensevoice
from ps_slm_tpu.models import projector as proj
from ps_slm_tpu.ops.merge import Merged, merge_audio_text
from ps_slm_tpu.ops.psd import psd
from ps_slm_tpu.ops.pseudo_posterior import (
    pseudo_posterior,
    pseudo_posterior_noise,
)
from ps_slm_tpu.registry import register_model

Params = Dict[str, Any]

IGNORE_ID = -100


@dataclass(frozen=True)
class TasuFlags:
    """Static algorithm switches (TrainConfig, aispeech_asr_config.py:66-121)."""

    ctc_posterior: bool = False
    voca_trans: bool = False
    gt_emb: bool = False
    gt_emb_noise: bool = False
    do_psd: bool = False
    top1_emb: bool = False
    cross_attn: bool = False
    drop_prob: float = 0.05
    insert_prob: float = 0.0
    smooth_low: float = 0.0
    smooth_high: float = 0.1
    # forward's voca_trans PSD uses blank 151643 while generate uses the
    # encoder blank id (reference inconsistency, ps-slm.py:491 vs :621);
    # mirrored faithfully.
    voca_trans_blank_id: int = 151643
    blank_threshold: float = 0.9

    @property
    def needs_encoder(self) -> bool:
        """Text-only TASU never consumes encoder output (SURVEY §2.B note 1)."""
        return not (self.ctc_posterior and not self.voca_trans and self.gt_emb)

    @staticmethod
    def from_train_config(tc, model_config=None) -> "TasuFlags":
        # the reference derives cross_attn from the projector name
        # (ps-slm.py:214-217); the config flag is an additional override
        cross = bool(tc.cross_attn) or (
            model_config is not None
            and model_config.encoder_projector == "cross-attention"
        )
        return TasuFlags(
            ctc_posterior=tc.ctc_posterior,
            voca_trans=tc.voca_trans,
            gt_emb=tc.gt_emb,
            gt_emb_noise=tc.gt_emb_noise,
            do_psd=tc.do_psd,
            top1_emb=tc.top1_emb,
            cross_attn=cross,
            drop_prob=tc.drop_prob,
            insert_prob=tc.insert_prob,
            smooth_low=tc.smooth_low,
            smooth_high=tc.smooth_high,
            voca_trans_blank_id=tc.voca_trans_blank_id,
        )


@dataclass
class TasuModel:
    """Bundle of params + static configs; params live in ``self.params``."""

    params: Params
    llm_cfg: qwen2.Qwen2Config
    enc_cfg: sensevoice.SenseVoiceConfig
    model_cfg: Any              # ps_slm_tpu.config.ModelConfig
    flags: TasuFlags
    speech_token_id: int = 0
    pad_token_id: int = 0
    use_flash: Optional[bool] = None
    remat: bool = False
    lora_dropout: float = 0.0       # peft lora_dropout, train path only
    cmvn: Optional[tuple] = None     # (neg_mean, inv_std) for on-device CMVN
    fbank_cfg: Any = None            # FbankConfig for the on-device front end
    mesh: Any = None                 # set for multi-device runs: batch-dim
                                     # sharding constraints on merged tensors
    pp_microbatches: int = 0         # GPipe microbatches when the mesh has a
                                     # pipe axis > 1 (0 = 2 x stages)


# ----------------------------------------------------------------------------
# audio front half: queries + encoder + ctc posterior + slice
# ----------------------------------------------------------------------------

def encode_speech(
    params: Params,
    enc_cfg: sensevoice.SenseVoiceConfig,
    input_features: jnp.ndarray,      # [B, A, input_size]
    input_feature_length: jnp.ndarray,  # [B]
    *,
    use_flash: Optional[bool] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Query prepend -> encoder -> CTC softmax -> drop first 4 frames.

    Reference ps-slm.py:430-454: language query id 0, event/emo ids [1,2],
    textnorm id 2, prepended in order [language, event_emo, textnorm].
    Returns (encoder_out [B,A,D], ctc_posterior [B,A,V], lens [B]).
    """
    b = input_features.shape[0]
    ep = params["encoder"]
    queries = sensevoice.query_embedding(ep, [0, 1, 2, 2])  # [4, input_size]
    queries = jnp.broadcast_to(
        queries[None], (b,) + queries.shape
    ).astype(input_features.dtype)
    speech = jnp.concatenate([queries, input_features], axis=1)
    lens = input_feature_length + 4

    hidden, out_lens = sensevoice.encode(
        ep, enc_cfg, speech, lens, use_flash=use_flash, remat=remat
    )
    logits = sensevoice.ctc_logits(ep, hidden)
    # softmax statistics in fp32, stored back in the compute dtype (the
    # reference runs this under autocast bf16, deepspeed_utils.py:205)
    posterior = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        hidden.dtype
    )

    encoder_out = hidden[:, 4:, :]
    posterior = posterior[:, 4:, :]
    new_lens = jnp.clip(out_lens - 4, 0, None)
    return encoder_out, posterior, new_lens


# ----------------------------------------------------------------------------
# projector front half: every TASU branch -> (audio embeds, audio lens)
# ----------------------------------------------------------------------------

def compute_audio_embeds(
    model: TasuModel,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array],
    *,
    generate_mode: bool = False,
    train: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch the §2.B branch tree. Returns (embeds [B,A',H], lens [B]).

    ``train=False`` (eval loss) disables dither and SpecAugment — the
    reference zeroes dither outside the train split
    (speech_dataset_large.py:230) — while gt_emb_noise stays on, matching
    its unconditional application in forward (ps-slm.py:463-464).
    """
    f = model.flags
    mc = model.model_cfg
    k = proj.downsample_rate(mc)

    if f.needs_encoder:
        if "input_features" in batch:
            feats = batch["input_features"]
            flens = batch["input_feature_length"]
        else:
            # on-device fused front end (raw waveform in the batch): the
            # reference computed fbank per-sample on host workers
            # (speech_dataset_large.py:134-146)
            from ps_slm_tpu.ops import fbank as fb

            aug = train and not generate_mode
            dither_key = (
                None if (rng is None or not aug) else jax.random.fold_in(rng, 1)
            )
            feats, flens = fb.frontend(
                batch["waveform"], batch["waveform_length"],
                dither_key, cfg=model.fbank_cfg, cmvn=model.cmvn,
                train=aug,
            )
            feats = feats.astype(
                params["llm"]["embed_tokens"].dtype
            )
        encoder_out, posterior, enc_lens = encode_speech(
            params, model.enc_cfg, feats, flens,
            use_flash=model.use_flash, remat=model.remat,
        )

    if f.ctc_posterior and not f.voca_trans:
        if f.gt_emb:
            # text-only TASU (ps-slm.py:459-468)
            if f.gt_emb_noise and not generate_mode:
                enc_outs, enc_lens = pseudo_posterior_noise(
                    batch["gt_ids"], batch["gt_lens"], rng,
                    vocab_size=model.enc_cfg.vocab_size,
                    drop_prob=f.drop_prob, insert_prob=f.insert_prob,
                    smooth_low=f.smooth_low, smooth_high=f.smooth_high,
                    blank_id=model.enc_cfg.blank_id,
                )
            else:
                enc_outs, enc_lens = pseudo_posterior(
                    batch["gt_ids"], batch["gt_lens"],
                    vocab_size=model.enc_cfg.vocab_size,
                )
            # projector consumes the compute dtype (autocast parity)
            enc_outs = enc_outs.astype(
                params["llm"]["embed_tokens"].dtype
            )
        else:
            if f.do_psd:
                enc_outs, enc_lens = psd(
                    posterior, enc_lens, posterior,
                    blank_id=model.enc_cfg.blank_id,
                    blank_threshold=f.blank_threshold,
                )
            else:
                enc_outs = posterior

        if f.cross_attn:
            llm_embed = params["llm"]["embed_tokens"]
            outs = proj.apply_cross_attention(
                params["projector"], mc, enc_outs, llm_embed
            )
            return outs, enc_lens
        outs = proj.apply_projector(params["projector"], mc, enc_outs)
        return outs, enc_lens // k

    if f.ctc_posterior and f.voca_trans:
        # LegoSLM baseline (ps-slm.py:485-514)
        logits = proj.apply_projector(params["projector"], mc, encoder_out)
        lens = enc_lens // k
        embed_matrix = params["llm"]["embed_tokens"]  # [V_llm, H]
        if f.do_psd:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            blank = (
                model.enc_cfg.blank_id if generate_mode
                else f.voca_trans_blank_id
            )
            logits, lens = psd(
                logits, lens, probs,
                blank_id=blank, blank_threshold=f.blank_threshold,
            )
            v_real = logits.shape[-1] - 1
            logits = logits[..., :v_real]
        else:
            v_real = logits.shape[-1]
        ctc_outs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if f.top1_emb:
            top1 = jnp.argmax(ctc_outs, axis=-1)
            outs = embed_matrix[top1]
        else:
            outs = jnp.einsum(
                "btv,vh->bth", ctc_outs.astype(embed_matrix.dtype),
                embed_matrix[:v_real],
            )
        return outs, lens

    # raw-feature baseline (ps-slm.py:515-523)
    if f.do_psd:
        enc_outs, enc_lens = psd(
            encoder_out, enc_lens, posterior,
            blank_id=model.enc_cfg.blank_id, blank_threshold=f.blank_threshold,
        )
    else:
        enc_outs = encoder_out
    outs = proj.apply_projector(params["projector"], mc, enc_outs)
    return outs, enc_lens // k


# ----------------------------------------------------------------------------
# full forward: merge + LLM + loss
# ----------------------------------------------------------------------------

def prepare_merged(
    model: TasuModel,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    *,
    left_padding: bool = False,
    generate_mode: bool = False,
    train: bool = True,
) -> Merged:
    audio_embeds, audio_lens = compute_audio_embeds(
        model, params, batch, rng, generate_mode=generate_mode, train=train
    )
    llm_params = params["llm"]
    if model.mesh is not None:
        # FSDP allgather-at-use for the embedding table: its fsdp shard
        # rides the FEATURE dim (vocab holds 'tensor'), and a gather from a
        # feature-sharded table emits feature-sharded embeddings that GSPMD
        # can only reshard to batch-sharded via involuntary full
        # rematerialization on data>1 meshes (spmd_partitioner.cc warning,
        # tests/test_parallel.py::test_no_involuntary_remat_on_tp_mesh).
        # Pinning the table to P('tensor', None) makes the fsdp allgather
        # explicit BEFORE the lookup — the vocab-sharded gather itself is
        # the pattern GSPMD partitions well (masked gather + psum).
        llm_params = {
            **llm_params,
            "embed_tokens": _fsdp_gathered_table(
                llm_params["embed_tokens"], model.mesh
            ),
        }
    inputs_embeds = qwen2.embed(llm_params, batch["input_ids"])
    if model.mesh is not None:
        # constrain the merge *inputs* to batch-sharded / feature-replicated
        # so the scatter runs batch-local
        audio_embeds = _batch_sharded(audio_embeds, model.mesh)
        inputs_embeds = _batch_sharded(inputs_embeds, model.mesh)
    merged = merge_audio_text(
        audio_embeds.astype(inputs_embeds.dtype),
        audio_lens,
        inputs_embeds,
        batch["input_ids"],
        batch["attention_mask"],
        batch.get("labels"),
        speech_token_id=model.speech_token_id,
        ignore_id=IGNORE_ID,
        pad_token_id=model.pad_token_id,
        left_padding=left_padding,
    )
    if model.mesh is not None:
        # keep the merged tensors batch-sharded (no-op when the inputs were
        # constrained above, but pins the layout for downstream consumers)
        merged = Merged(
            *(None if f is None else _batch_sharded(f, model.mesh)
              for f in merged)
        )
    return merged


def _batch_sharded(x: jnp.ndarray, mesh) -> jnp.ndarray:
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * x.ndim
    spec[0] = ("data", "fsdp")
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def _fsdp_gathered_table(table: jnp.ndarray, mesh) -> jnp.ndarray:
    """Embed table at use: vocab dim keeps 'tensor', feature dim gathered."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        table, NamedSharding(mesh, P("tensor", None))
    )


def forward(
    model: TasuModel,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Training forward: returns (loss, metrics {acc, ntokens}).

    Loss = causal CE on merged labels (HF shift semantics, ps-slm.py:530);
    accuracy = argmax match on non-ignored shifted labels (metric.py:3-20).
    ``train=False`` = torch ``model.eval()``: LoRA dropout, dither, and
    SpecAugment off; gt_emb_noise unaffected (unconditional in the
    reference forward).
    """
    merged = prepare_merged(
        model, params, batch, rng, left_padding=False, train=train
    )
    hidden, _ = qwen2.forward(
        params["llm"], model.llm_cfg, merged.embeds,
        attention_mask=merged.attention_mask,
        position_ids=merged.position_ids,
        use_flash=model.use_flash, remat=model.remat,
        lora_dropout=model.lora_dropout,
        lora_dropout_rng=(
            jax.random.fold_in(rng, 23)
            if (train and rng is not None and model.lora_dropout > 0.0)
            else None
        ),
        pipeline_mesh=model.mesh,
        pp_microbatches=model.pp_microbatches,
    )

    labels = merged.labels
    if "batch_valid" in batch:
        # padded rows from deterministic global batching contribute nothing
        labels = jnp.where(batch["batch_valid"][:, None], labels, IGNORE_ID)

    w = params["llm"].get("lm_head")
    if w is None:
        w = params["llm"]["embed_tokens"].T

    # CE strategy (ops/ce_loss.py):
    #   1. merged audio+text batches carry labels only on the text target
    #      positions (the audio span and prompt are -100), so the gathered CE
    #      unembeds just those <= B x text_len rows — ~17x fewer CE FLOPs at
    #      the published recipe's shapes;
    #   2. otherwise full fp32 logits while they fit;
    #   3. chunked/rematerialized CE above ~1.5 GB of logits.
    b_, t_ = labels.shape
    text_len = batch["input_ids"].shape[1]
    if text_len <= (t_ - 1) // 2:
        from ps_slm_tpu.ops.ce_loss import gathered_ce_loss

        # per-row bound = pre-merge text length, rounded to a sublane tile
        max_valid = min(-(-text_len // 8) * 8, t_ - 1)
        loss, acc, ntok = gathered_ce_loss(
            hidden, w, labels, max_valid=max_valid, ignore_id=IGNORE_ID
        )
        return loss, {"acc": acc, "ntokens": ntok}

    logits_bytes = b_ * t_ * w.shape[-1] * 4
    if logits_bytes > 3 * 2 ** 29:  # 1.5 GB
        from ps_slm_tpu.ops.ce_loss import chunked_ce_loss

        loss, acc, ntok = chunked_ce_loss(
            hidden, w, labels, ignore_id=IGNORE_ID
        )
        return loss, {"acc": acc, "ntokens": ntok}

    logits = qwen2.unembed(params["llm"], hidden)  # fp32 [B,T,V]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_ID
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(
        logp, safe_labels[..., None], axis=-1
    )[..., 0]
    ntok = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, token_ll, 0.0)) / ntok
    preds = jnp.argmax(shift_logits, axis=-1)
    acc = jnp.sum((preds == shift_labels) & valid) / ntok
    return loss, {"acc": acc, "ntokens": jnp.sum(valid)}


# ----------------------------------------------------------------------------
# factory
# ----------------------------------------------------------------------------

@register_model("tasu")
def model_factory(
    train_config, model_config, *, rng=None, dtype=jnp.float32, **kwargs
) -> TasuModel:
    """Build a TasuModel (reference ``model_factory``, ps-slm.py:130-181).

    Loads HF/funasr checkpoints when paths are given; otherwise random-inits
    (with optional tiny-config overrides) for tests.  LoRA adapters are added
    by :mod:`ps_slm_tpu.models.lora` when ``use_peft``.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(train_config.seed)
    k_llm, k_enc, k_proj = jax.random.split(rng, 3)

    # --- LLM ---
    if model_config.llm_path:
        llm_params, llm_cfg = qwen2.load_hf_checkpoint(
            model_config.llm_path, dtype=dtype
        )
    else:
        # no checkpoint: random init, tiny by default (tests / smoke runs)
        over = model_config.llm_config_overrides or {}
        llm_cfg = qwen2.Qwen2Config.tiny(**over)
        llm_params = qwen2.init_params(k_llm, llm_cfg, dtype)

    # --- encoder ---
    enc_over = model_config.encoder_config_overrides or {}
    if model_config.encoder_path:
        from ps_slm_tpu.training.checkpoint import load_funasr_encoder

        enc_params, enc_cfg = load_funasr_encoder(
            model_config.encoder_path, dtype=dtype, **enc_over
        )
    else:
        # no checkpoint: random init, tiny by default (tests / smoke runs)
        enc_cfg = sensevoice.SenseVoiceConfig.tiny(**enc_over)
        enc_params = sensevoice.init_params(k_enc, enc_cfg, dtype)

    proj_params = proj.init_projector(k_proj, model_config, dtype)
    if model_config.ctc_linear:
        # pretrained CTC head into simple_linear (ps-slm.py:64-85)
        from ps_slm_tpu.training.checkpoint import load_ctc_linear

        proj_params = load_ctc_linear(
            model_config.ctc_linear, proj_params, dtype
        )

    params: Params = {
        "encoder": enc_params,
        "projector": proj_params,
        "llm": llm_params,
    }

    if train_config.quantization:
        # weight-only LLM: int8 (reference load_in_8bit, ps-slm.py:92-103)
        # or group-wise int4 (quant_bits=4, beyond reference)
        from ps_slm_tpu.models.quantization import quantize_llm

        params["llm"] = quantize_llm(
            params["llm"],
            bits=getattr(train_config, "quant_bits", 8),
            group_size=getattr(train_config, "q4_group_size", 128),
        )

    if train_config.use_peft:
        # reference PEFT dispatch is live code: peft_configs = {"lora",
        # "llama_adapter", "prefix"} at utils/config_utils.py:43-58; all
        # three are implemented (models/lora.py).
        method = train_config.peft_config.peft_method
        if method == "lora":
            from ps_slm_tpu.models.lora import add_lora

            params["llm"] = add_lora(
                params["llm"], train_config.peft_config,
                jax.random.fold_in(rng, 17), dtype,
            )
        elif method == "prefix":
            from ps_slm_tpu.models.lora import add_prefix_tuning

            params["llm"] = add_prefix_tuning(
                params["llm"], train_config.peft_config, llm_cfg,
                jax.random.fold_in(rng, 19), dtype,
            )
        elif method == "llama_adapter":
            from ps_slm_tpu.models.lora import add_llama_adapter

            params["llm"] = add_llama_adapter(
                params["llm"], train_config.peft_config, llm_cfg,
                jax.random.fold_in(rng, 23), dtype,
            )
        else:
            raise NotImplementedError(
                f"peft_method={method!r}; 'lora', 'prefix' and "
                "'llama_adapter' are supported"
            )

    flags = TasuFlags.from_train_config(train_config, model_config)
    model = TasuModel(
        params=params,
        llm_cfg=llm_cfg,
        enc_cfg=enc_cfg,
        model_cfg=model_config,
        flags=flags,
        remat=train_config.remat,
        lora_dropout=(
            train_config.peft_config.lora_dropout
            if train_config.use_peft else 0.0
        ),
    )
    return model


def trainable_mask(model: TasuModel, train_config) -> Params:
    """Pytree of bools marking trainable leaves.

    Freeze semantics from the reference: freeze_encoder (ps-slm.py:35-38),
    freeze_llm (:105-108), freeze_projector (:50-54,81-85); under PEFT only
    the adapter leaves (LoRA a/b or prefix k/v, + optionally embeddings,
    use_emb :119-123) train in the LLM.

    Only floating-point array leaves can be trainable: static metadata
    leaves (head counts in projector params, int8 'scale'/'q8' payloads)
    must never reach ``value_and_grad`` — they stay in the frozen
    partition like requires_grad=False buffers.
    """
    def differentiable(leaf) -> bool:
        dt = getattr(leaf, "dtype", None)
        return dt is not None and jnp.issubdtype(dt, jnp.floating)

    def const(tree, value):
        return jax.tree_util.tree_map(
            lambda leaf: value and differentiable(leaf), tree
        )

    mask: Params = {}
    mask["encoder"] = const(model.params["encoder"], not train_config.freeze_encoder)
    mask["projector"] = const(
        model.params["projector"], not train_config.freeze_projector
    )

    if train_config.use_peft:
        def llm_label(path, leaf):
            if not differentiable(leaf):
                return False
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if any(
                str(k) in (
                    "lora_a", "lora_b", "prefix_k", "prefix_v",
                    # llama_adapter: prompt+gate train; the 0/1 layer mask
                    # is a frozen buffer (models/lora.py::add_llama_adapter)
                    "adaption_prompt", "adaption_gate",
                )
                for k in keys
            ):
                return True
            if train_config.use_emb and any(
                str(k) == "embed_tokens" for k in keys
            ):
                return True
            return False

        mask["llm"] = jax.tree_util.tree_map_with_path(
            llm_label, model.params["llm"]
        )
    else:
        mask["llm"] = const(model.params["llm"], not train_config.freeze_llm)
    return mask
