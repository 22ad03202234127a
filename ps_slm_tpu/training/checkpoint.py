"""Checkpoint subsystem.

Three responsibilities (reference: ``Multitask/utils/checkpoint_handler.py``
and the strict=False composite load at ``ps-slm.py:163-170``):

  1. **Native training checkpoints**: Orbax async sharded save/restore of
     (params, opt_state, step) — the ZeRO/FSDP checkpoint suite equivalent
     (checkpoint_handler.py:53-182) with resharding on restore.
  2. **Reference-format interchange**: bidirectional converter to/from the
     composite ``pytorch_model.bin`` key layout (``encoder.* /
     encoder_projector.* / llm.*``) so released TASU checkpoints
     (readme.md:65-66) load, and our checkpoints can be consumed by the
     reference.  ``strict=False`` semantics: unmatched keys are reported,
     not fatal.  ``exclude_frozen``: like DeepSpeed's
     ``exclude_frozen_parameters=True`` (checkpoint_handler.py:176).
  3. **External asset import**: funasr SenseVoiceSmall ``model.pt`` (+
     config.yaml dims) and the pretrained CTC head for ``simple_linear``
     (ps-slm.py:64-85).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ----------------------------------------------------------------------------
# 3. external assets
# ----------------------------------------------------------------------------

def _torch_load_state(path: str) -> Dict[str, np.ndarray]:
    """Host-side torch checkpoint read -> numpy dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {
        k: v.detach().to(torch.float32).numpy()
        for k, v in obj.items()
        if hasattr(v, "detach")
    }


def _parse_encoder_yaml(path: str) -> dict:
    """Minimal YAML subset reader for funasr config.yaml encoder_conf."""
    try:
        import yaml  # type: ignore

        with open(path) as f:
            full = yaml.safe_load(f)
        conf = dict(full.get("encoder_conf", {}))
        conf["input_size"] = full.get("input_size", conf.get("input_size", 560))
        conf["vocab_size"] = full.get("vocab_size", 25055)
        return conf
    except ImportError:
        conf: dict = {}
        top: dict = {}  # top-level scalars (input_size/vocab_size live here)
        section = None
        with open(path) as f:
            for line in f:
                if not line.strip() or line.lstrip().startswith("#"):
                    continue
                indent = len(line) - len(line.lstrip())
                m = re.match(r"([\w_]+):\s*(.*)", line.strip())
                if not m:
                    continue
                key, val = m.groups()

                def parse(v):
                    try:
                        return json.loads(v)
                    except json.JSONDecodeError:
                        return v

                if indent == 0:
                    section = key if val == "" else None
                    if val != "":
                        top[key] = parse(val)
                    continue
                if section == "encoder_conf" and val != "":
                    conf[key] = parse(val)
        # same precedence as the yaml branch above
        conf["input_size"] = top.get(
            "input_size", conf.get("input_size", 560)
        )
        conf["vocab_size"] = top.get("vocab_size", 25055)
        return conf


def load_funasr_encoder(path: str, dtype=jnp.float32, **overrides):
    """Load a funasr SenseVoiceSmall dir (model.pt + config.yaml).

    Mirrors ``SenseVoiceSmall.from_pretrained`` (SenseVoice.py:651-655) minus
    the funasr registry machinery.
    """
    from ps_slm_tpu.models import sensevoice as sv

    conf: dict = {}
    ypath = os.path.join(path, "config.yaml")
    if os.path.exists(ypath):
        raw = _parse_encoder_yaml(ypath)
        for k in (
            "input_size", "output_size", "attention_heads", "linear_units",
            "num_blocks", "tp_blocks", "kernel_size", "sanm_shift",
            "vocab_size",
        ):
            if k in raw:
                conf[k] = int(raw[k])
    conf.update(overrides)
    cfg = sv.SenseVoiceConfig(**conf)

    for cand in ("model.pt", "model.pb", "pytorch_model.bin"):
        mpath = os.path.join(path, cand)
        if os.path.exists(mpath):
            tensors = _torch_load_state(mpath)
            break
    else:
        raise FileNotFoundError(f"no model.pt under {path}")
    params = sv.funasr_tensors_to_params(tensors, cfg, dtype)
    return params, cfg


def load_ctc_linear(path: str, proj_params: Params, dtype=jnp.float32) -> Params:
    """Pretrained CTC head -> simple_linear projector (ps-slm.py:64-85)."""
    state = _torch_load_state(path)
    out = dict(proj_params)
    out["map"] = {
        "kernel": jnp.asarray(state["ctc_head.weight"].T, dtype),
        "bias": jnp.asarray(state["ctc_head.bias"], dtype),
    }
    return out


# ----------------------------------------------------------------------------
# 2. reference-format interchange (pytorch_model.bin key layout)
# ----------------------------------------------------------------------------

_PROJ_KEYMAPS = {
    # our pytree path -> reference module path (+ transpose flag for kernels)
    "simple_linear": {
        ("map", "kernel"): ("map.weight", True),
        ("map", "bias"): ("map.bias", False),
    },
    "linear": {
        ("linear1", "kernel"): ("linear1.weight", True),
        ("linear1", "bias"): ("linear1.bias", False),
        ("linear2", "kernel"): ("linear2.weight", True),
        ("linear2", "bias"): ("linear2.bias", False),
    },
    "cov1d-linear": {
        # torch Conv1d weight [out,in,k] <-> ours [k,in,out]
        ("conv", "kernel"): ("conv1d.weight", "conv"),
        ("conv", "bias"): ("conv1d.bias", False),
        ("linear1", "kernel"): ("linear1.weight", True),
        ("linear1", "bias"): ("linear1.bias", False),
        ("linear2", "kernel"): ("linear2.weight", True),
        ("linear2", "bias"): ("linear2.bias", False),
    },
    "linear-silu": {
        ("norm", "weight"): ("norm.weight", False),
        ("norm", "bias"): ("norm.bias", False),
        ("ffn1", "kernel"): ("ffn.0.weight", True),
        ("ffn1", "bias"): ("ffn.0.bias", False),
        ("ffn2", "kernel"): ("ffn.2.weight", True),
        ("ffn2", "bias"): ("ffn.2.bias", False),
    },
    "cross-attention": {
        ("w_q", "kernel"): ("W_q.weight", True),
    },
}


def _qformer_layer_keymap(layer: Params, prefix: str):
    """(our leaf ref, HF name, transpose) triples for one Blip2QFormerLayer.

    HF module structure verified against the installed transformers
    Blip2QFormerModel; reference wrapper at ``projector.py:76-101``.
    """
    pairs = [
        (("self_q", "kernel"), f"{prefix}.attention.attention.query.weight", True),
        (("self_q", "bias"), f"{prefix}.attention.attention.query.bias", False),
        (("self_k", "kernel"), f"{prefix}.attention.attention.key.weight", True),
        (("self_k", "bias"), f"{prefix}.attention.attention.key.bias", False),
        (("self_v", "kernel"), f"{prefix}.attention.attention.value.weight", True),
        (("self_v", "bias"), f"{prefix}.attention.attention.value.bias", False),
        (("self_o", "kernel"), f"{prefix}.attention.output.dense.weight", True),
        (("self_o", "bias"), f"{prefix}.attention.output.dense.bias", False),
        (("ln_self", "weight"), f"{prefix}.attention.output.LayerNorm.weight", False),
        (("ln_self", "bias"), f"{prefix}.attention.output.LayerNorm.bias", False),
        (("ffn1", "kernel"), f"{prefix}.intermediate_query.dense.weight", True),
        (("ffn1", "bias"), f"{prefix}.intermediate_query.dense.bias", False),
        (("ffn2", "kernel"), f"{prefix}.output_query.dense.weight", True),
        (("ffn2", "bias"), f"{prefix}.output_query.dense.bias", False),
        (("ln_ffn", "weight"), f"{prefix}.output_query.LayerNorm.weight", False),
        (("ln_ffn", "bias"), f"{prefix}.output_query.LayerNorm.bias", False),
    ]
    if "cross_q" in layer:
        pairs += [
            (("cross_q", "kernel"), f"{prefix}.crossattention.attention.query.weight", True),
            (("cross_q", "bias"), f"{prefix}.crossattention.attention.query.bias", False),
            (("cross_k", "kernel"), f"{prefix}.crossattention.attention.key.weight", True),
            (("cross_k", "bias"), f"{prefix}.crossattention.attention.key.bias", False),
            (("cross_v", "kernel"), f"{prefix}.crossattention.attention.value.weight", True),
            (("cross_v", "bias"), f"{prefix}.crossattention.attention.value.bias", False),
            (("cross_o", "kernel"), f"{prefix}.crossattention.output.dense.weight", True),
            (("cross_o", "bias"), f"{prefix}.crossattention.output.dense.bias", False),
            (("ln_cross", "weight"), f"{prefix}.crossattention.output.LayerNorm.weight", False),
            (("ln_cross", "bias"), f"{prefix}.crossattention.output.LayerNorm.bias", False),
        ]
    return pairs


def _qformer_keymap(proj_params: Params):
    """Full q-former keymap: (our (node, leaf) path, ref name, transpose)."""
    pairs = [
        ((("query",),), "query", False),
        ((("ln_embed", "weight"),), "qformer.layernorm.weight", False),
        ((("ln_embed", "bias"),), "qformer.layernorm.bias", False),
        ((("out", "kernel"),), "linear.weight", True),
        ((("out", "bias"),), "linear.bias", False),
        ((("out_norm", "weight"),), "norm.weight", False),
        ((("out_norm", "bias"),), "norm.bias", False),
    ]
    flat = [(p[0], name, t) for p, name, t in pairs]
    for i, layer in enumerate(proj_params["layers"]):
        for (node, leaf), name, t in _qformer_layer_keymap(
            layer, f"qformer.encoder.layer.{i}"
        ):
            flat.append((("layers", i, node, leaf), name, t))
    return flat


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _tree_set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _qformer_to_reference(proj_params: Params) -> Dict[str, np.ndarray]:
    out = {}
    for path, name, t in _qformer_keymap(proj_params):
        arr = np.asarray(_tree_get(proj_params, path), np.float32)
        out[f"encoder_projector.{name}"] = arr.T if t else arr
    return out


def _copy_containers(tree):
    """Copy dict/list structure, sharing the leaves."""
    if isinstance(tree, dict):
        return {k: _copy_containers(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_copy_containers(v) for v in tree]
    return tree


def _reference_to_qformer(
    tensors: Dict[str, np.ndarray], proj_params: Params, dtype=jnp.float32
) -> Tuple[Params, list]:
    out = _copy_containers(proj_params)
    loaded = []
    for path, name, t in _qformer_keymap(proj_params):
        key = f"encoder_projector.{name}"
        if key not in tensors:
            continue
        arr = np.asarray(tensors[key], np.float32)
        _tree_set(out, path, jnp.asarray(arr.T if t else arr, dtype))
        loaded.append(key)
    return out, loaded


def projector_to_reference(
    proj_params: Params, projector_name: str
) -> Dict[str, np.ndarray]:
    if projector_name == "q-former":
        return _qformer_to_reference(proj_params)
    keymap = _PROJ_KEYMAPS.get(projector_name)
    if keymap is None:
        raise NotImplementedError(
            f"reference key layout for projector {projector_name!r}"
        )
    out = {}
    for (node, leaf), (refname, transform) in keymap.items():
        arr = np.asarray(proj_params[node][leaf], np.float32)
        if transform == "conv":
            arr = arr.transpose(2, 1, 0)
        elif transform:
            arr = arr.T
        out[f"encoder_projector.{refname}"] = arr
    return out


def reference_to_projector(
    tensors: Dict[str, np.ndarray], proj_params: Params, projector_name: str,
    dtype=jnp.float32,
) -> Tuple[Params, list]:
    if projector_name == "q-former":
        return _reference_to_qformer(tensors, proj_params, dtype)
    keymap = _PROJ_KEYMAPS.get(projector_name)
    if keymap is None:
        raise NotImplementedError(projector_name)
    loaded = []
    out = jax.tree_util.tree_map(lambda x: x, proj_params)  # shallow copy tree
    for (node, leaf), (refname, transform) in keymap.items():
        key = f"encoder_projector.{refname}"
        if key not in tensors:
            continue
        arr = np.asarray(tensors[key], np.float32)
        if transform == "conv":
            arr = arr.transpose(2, 1, 0)
        elif transform:
            arr = arr.T
        out[node] = dict(out[node])
        out[node][leaf] = jnp.asarray(arr, dtype)
        loaded.append(key)
    return out, loaded


def export_reference_checkpoint(
    model, path: str, *, exclude: tuple = ()
) -> Dict[str, np.ndarray]:
    """Write a reference-layout ``pytorch_model.bin``.

    Like the rank-0 zero→fp32 consolidation (checkpoint_handler.py:169-182):
    fp32 tensors, composite key names.  ``exclude`` names whole submodules
    ("llm" / "encoder" / "projector") to skip — the analogue of DeepSpeed's
    ``exclude_frozen_parameters=True`` (the reference freezes whole modules,
    so module granularity is exact).
    """
    from ps_slm_tpu.models import qwen2 as q

    tensors: Dict[str, np.ndarray] = {}

    if "llm" not in exclude:
        from ps_slm_tpu.models.lora import merge_lora
        from ps_slm_tpu.models.quantization import dequantize_llm

        llm_export = merge_lora(dequantize_llm(model.params["llm"]))
        for k, v in q.params_to_hf(llm_export, model.llm_cfg).items():
            tensors[f"llm.{k}"] = v

    if "encoder" not in exclude:
        tensors.update(
            _encoder_to_reference(model.params["encoder"], model.enc_cfg)
        )

    if "projector" not in exclude:
        tensors.update(
            projector_to_reference(
                model.params["projector"], model.model_cfg.encoder_projector
            )
        )

    if path:
        import torch

        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in tensors.items()},
            path,
        )
    return tensors


def _encoder_to_reference(enc_params: Params, enc_cfg) -> Dict[str, np.ndarray]:
    """Inverse of sensevoice.funasr_tensors_to_params, nested under
    'encoder.' (slam_model_asr.encoder is the SenseVoiceSmall module)."""
    out: Dict[str, np.ndarray] = {}

    def put_layer(prefix: str, lp: Params):
        out[f"{prefix}.norm1.weight"] = np.asarray(lp["norm1"]["weight"], np.float32)
        out[f"{prefix}.norm1.bias"] = np.asarray(lp["norm1"]["bias"], np.float32)
        out[f"{prefix}.norm2.weight"] = np.asarray(lp["norm2"]["weight"], np.float32)
        out[f"{prefix}.norm2.bias"] = np.asarray(lp["norm2"]["bias"], np.float32)
        out[f"{prefix}.self_attn.linear_q_k_v.weight"] = np.asarray(
            lp["qkv"]["kernel"], np.float32
        ).T
        out[f"{prefix}.self_attn.linear_q_k_v.bias"] = np.asarray(
            lp["qkv"]["bias"], np.float32
        )
        out[f"{prefix}.self_attn.linear_out.weight"] = np.asarray(
            lp["out"]["kernel"], np.float32
        ).T
        out[f"{prefix}.self_attn.linear_out.bias"] = np.asarray(
            lp["out"]["bias"], np.float32
        )
        out[f"{prefix}.self_attn.fsmn_block.weight"] = np.asarray(
            lp["fsmn"]["kernel"], np.float32
        ).transpose(2, 1, 0)
        out[f"{prefix}.feed_forward.w_1.weight"] = np.asarray(
            lp["w1"]["kernel"], np.float32
        ).T
        out[f"{prefix}.feed_forward.w_1.bias"] = np.asarray(
            lp["w1"]["bias"], np.float32
        )
        out[f"{prefix}.feed_forward.w_2.weight"] = np.asarray(
            lp["w2"]["kernel"], np.float32
        ).T
        out[f"{prefix}.feed_forward.w_2.bias"] = np.asarray(
            lp["w2"]["bias"], np.float32
        )

    put_layer("encoder.encoder.encoders0.0", enc_params["encoders0"])

    def put_stack(prefix, stacked, n):
        if stacked is None:
            return
        for i in range(n):
            lp = jax.tree_util.tree_map(lambda a: a[i], stacked)
            put_layer(f"{prefix}.{i}", lp)

    put_stack("encoder.encoder.encoders", enc_params["encoders"], enc_cfg.num_blocks - 1)
    put_stack("encoder.encoder.tp_encoders", enc_params["tp_encoders"], enc_cfg.tp_blocks)
    for name in ("after_norm", "tp_norm"):
        out[f"encoder.encoder.{name}.weight"] = np.asarray(
            enc_params[name]["weight"], np.float32
        )
        out[f"encoder.encoder.{name}.bias"] = np.asarray(
            enc_params[name]["bias"], np.float32
        )
    out["encoder.ctc.ctc_lo.weight"] = np.asarray(
        enc_params["ctc_lo"]["kernel"], np.float32
    ).T
    out["encoder.ctc.ctc_lo.bias"] = np.asarray(
        enc_params["ctc_lo"]["bias"], np.float32
    )
    out["encoder.embed.weight"] = np.asarray(
        enc_params["query_embed"], np.float32
    )
    return out


def import_reference_checkpoint(
    model, path_or_tensors, dtype=jnp.float32
) -> list:
    """Load a composite pytorch_model.bin with strict=False semantics
    (ps-slm.py:163-170): load every matching key, report the rest.

    Deviation from torch's per-leaf strict=False: each module (llm /
    encoder / projector) loads atomically — a checkpoint missing one
    tensor of a module raises ``KeyError("partial … checkpoint")``
    rather than silently mixing checkpoint and init weights.

    Returns the list of loaded reference keys.
    """
    from ps_slm_tpu.models import qwen2 as q
    from ps_slm_tpu.models import sensevoice as sv

    if isinstance(path_or_tensors, str):
        tensors = _torch_load_state(path_or_tensors)
    else:
        tensors = dict(path_or_tensors)

    loaded = []

    # llm.*
    llm_tensors = {
        k[len("llm."):]: v for k, v in tensors.items() if k.startswith("llm.")
    }
    if llm_tensors:
        try:
            consumed: set = set()
            new_llm = q.hf_tensors_to_params(
                llm_tensors, model.llm_cfg, dtype, consumed=consumed
            )
            # preserve LoRA leaves if present
            old_layers = model.params["llm"]["layers"]
            for name, node in new_llm["layers"].items():
                old = old_layers.get(name)
                if isinstance(old, dict):
                    for lk in ("lora_a", "lora_b", "lora_scale"):
                        if lk in old:
                            node[lk] = old[lk]
            from ps_slm_tpu.models.quantization import (
                quant_spec, quantize_llm,
            )

            spec = quant_spec(model.params["llm"])
            if spec is not None:
                # the factory quantized (train_config.quantization); keep
                # the imported weights quantized with the SAME scheme —
                # otherwise the knob is silently dropped on every
                # checkpointed serve/decode
                new_llm = quantize_llm(
                    new_llm, bits=spec[0], group_size=spec[1]
                )
            model.params["llm"] = new_llm
            # only keys the mapper actually read — an unconsumed key (e.g.
            # rotary_emb.inv_freq or a renamed tensor) must surface as
            # unmatched under the strict=False contract, not as loaded
            loaded += [f"llm.{k}" for k in llm_tensors if k in consumed]
        except KeyError as e:
            raise KeyError(f"partial llm checkpoint, missing {e}") from e

    # encoder.*
    enc_tensors = {
        k[len("encoder."):]: v
        for k, v in tensors.items()
        if k.startswith("encoder.") and not k.startswith("encoder_projector.")
    }
    if enc_tensors:
        try:
            enc_consumed: set = set()
            model.params["encoder"] = sv.funasr_tensors_to_params(
                enc_tensors, model.enc_cfg, dtype, consumed=enc_consumed
            )
            # same honesty rule as the llm branch: only keys the mapper
            # actually read count as loaded
            loaded += [f"encoder.{k}" for k in enc_tensors if k in enc_consumed]
        except KeyError as e:
            raise KeyError(f"partial encoder checkpoint, missing {e}") from e

    # encoder_projector.*
    new_proj, proj_loaded = reference_to_projector(
        tensors, model.params["projector"],
        model.model_cfg.encoder_projector, dtype,
    )
    model.params["projector"] = new_proj
    loaded += proj_loaded
    return loaded


# ----------------------------------------------------------------------------
# 2b. HF-PEFT adapter interchange (adapter_model.bin layout)
# ----------------------------------------------------------------------------

# our stacked-layer projection name -> HF module path inside the LLM
_PEFT_MODULES = {
    "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


def export_peft_adapters(model, path: str) -> Dict[str, np.ndarray]:
    """Write the active PEFT method's adapters in the HF-PEFT
    ``adapter_model.bin`` key layout so a reference user can resume them
    with ``PeftModel.from_pretrained`` (ps-slm.py:110-113).

    * LoRA: ``base_model.model.model.layers.{i}.<mod>.lora_{A,B}.weight``,
      raw A/B factors (NOT pre-scaled); an ``adapter_config.json`` with
      r/alpha derived from the exported leaves is written next to the
      weights so the consumer applies the same effective scale.
    * prefix-tuning: the single ``prompt_embeddings`` tensor
      [P, L*2*nkv*hd] in peft's ``get_prompt`` view order ([:, 2l] = layer
      l keys, [:, 2l+1] = values) — logit-parity-tested against a real
      peft PrefixTuning Qwen2 (tests/test_qwen2_parity.py).
    * llama_adapter: per-adapted-layer ``...self_attn.adaption_prompt``
      [1, P, hidden] + ``...adaption_gate`` [1] (peft ADAPTION_PROMPT
      layout; note peft itself only wires llama/mistral/gpt2, so a
      reference user cannot load these onto Qwen2 with stock peft — the
      export exists for llama-family interchange and inspection).
    """
    tensors: Dict[str, np.ndarray] = {}
    layers = model.params["llm"]["layers"]
    target_modules = []
    r = alpha = None
    config: Optional[dict] = None
    for name, hf_mod in _PEFT_MODULES.items():
        node = layers.get(name)
        if not isinstance(node, dict) or "lora_a" not in node:
            continue
        target_modules.append(name)
        a = np.asarray(node["lora_a"], np.float32)   # [L, d_in, r]
        bb = np.asarray(node["lora_b"], np.float32)  # [L, r, d_out]
        r = a.shape[2]
        if "lora_scale" in node:                      # scale = alpha / r
            alpha = float(np.asarray(node["lora_scale"])[0]) * r
        for i in range(a.shape[0]):
            pre = f"base_model.model.model.layers.{i}.{hf_mod}"
            tensors[f"{pre}.lora_A.weight"] = a[i].T        # [r, d_in]
            tensors[f"{pre}.lora_B.weight"] = bb[i].T       # [d_out, r]
    if tensors:
        config = {
            "peft_type": "LORA",
            "task_type": "CAUSAL_LM",
            "r": int(r),
            "lora_alpha": (
                alpha if alpha is None else
                int(alpha) if float(alpha).is_integer() else float(alpha)
            ),
            "lora_dropout": 0.0,
            "bias": "none",
            "target_modules": sorted(target_modules),
            "inference_mode": True,
        }

    if "prefix_k" in layers:
        pk = np.asarray(layers["prefix_k"], np.float32)  # [L, P, nkv, hd]
        pv = np.asarray(layers["prefix_v"], np.float32)
        L, P, nkv, hd = pk.shape
        emb = np.empty((P, L * 2, nkv, hd), np.float32)
        emb[:, 0::2] = pk.transpose(1, 0, 2, 3)
        emb[:, 1::2] = pv.transpose(1, 0, 2, 3)
        tensors["prompt_embeddings"] = emb.reshape(P, L * 2 * nkv * hd)
        config = {
            "peft_type": "PREFIX_TUNING",
            "task_type": "CAUSAL_LM",
            "num_virtual_tokens": int(P),
            "num_layers": int(L),
            # peft resolves these to the KV-head geometry for GQA models
            "num_attention_heads": int(nkv),
            "token_dim": int(nkv * hd),
            "num_transformer_submodules": 1,
            "prefix_projection": False,
            "inference_mode": True,
        }

    if "adaption_prompt" in layers:
        ap = np.asarray(layers["adaption_prompt"], np.float32)  # [L, P, h]
        ag = np.asarray(layers["adaption_gate"], np.float32)    # [L]
        am = np.asarray(layers["adaption_mask"], np.float32)
        for l in range(ap.shape[0]):
            if am[l] == 0.0:
                continue  # peft only materializes adapted layers
            pre = f"base_model.model.model.layers.{l}.self_attn"
            tensors[f"{pre}.adaption_prompt"] = ap[l][None]
            tensors[f"{pre}.adaption_gate"] = ag[l : l + 1]
        config = {
            "peft_type": "ADAPTION_PROMPT",
            "task_type": "CAUSAL_LM",
            "adapter_len": int(ap.shape[1]),
            "adapter_layers": int(am.sum()),
            "target_modules": "self_attn",
            "inference_mode": True,
        }

    if path:
        import torch

        os.makedirs(path, exist_ok=True)
        torch.save(
            {k: torch.from_numpy(v.copy()) for k, v in tensors.items()},
            os.path.join(path, "adapter_model.bin"),
        )
        if config is not None:
            with open(os.path.join(path, "adapter_config.json"), "w") as f:
                json.dump(config, f, indent=2)
    return tensors


def import_peft_adapters(model, path_or_tensors, dtype=jnp.float32) -> list:
    """Load an HF-PEFT adapter checkpoint (dir with adapter_model.bin, the
    file itself, or a tensor dict) onto the LoRA leaves.  The reference's
    ``peft_ckpt`` resume (ps-slm.py:110-113).

    When an ``adapter_config.json`` sits next to the weights, its
    ``lora_alpha / r`` also sets our per-layer ``lora_scale`` — raw A/B
    factors are scale-free, so importing an adapter trained with a
    different alpha/r than the current config would otherwise silently
    mis-scale every adapter contribution."""
    cfg_scale = None
    if isinstance(path_or_tensors, str):
        p = path_or_tensors
        cfg_dir = p if os.path.isdir(p) else os.path.dirname(p)
        cfg_path = os.path.join(cfg_dir, "adapter_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                acfg = json.load(f)
            r, alpha = acfg.get("r"), acfg.get("lora_alpha")
            if r and alpha is not None:
                cfg_scale = float(alpha) / float(r)
        if os.path.isdir(p):
            p = os.path.join(p, "adapter_model.bin")
        tensors = _torch_load_state(p)
    else:
        tensors = dict(path_or_tensors)

    layers = model.params["llm"]["layers"]
    loaded = []
    for name, hf_mod in _PEFT_MODULES.items():
        node = layers.get(name)
        if not isinstance(node, dict) or "lora_a" not in node:
            continue
        a = np.asarray(node["lora_a"], np.float32).copy()
        bb = np.asarray(node["lora_b"], np.float32).copy()
        for i in range(a.shape[0]):
            pre = f"base_model.model.model.layers.{i}.{hf_mod}"
            ka, kb = f"{pre}.lora_A.weight", f"{pre}.lora_B.weight"
            if ka in tensors:
                a[i] = np.asarray(tensors[ka], np.float32).T
                loaded.append(ka)
            if kb in tensors:
                bb[i] = np.asarray(tensors[kb], np.float32).T
                loaded.append(kb)
        node["lora_a"] = jnp.asarray(a, dtype)
        node["lora_b"] = jnp.asarray(bb, dtype)
        if cfg_scale is not None and "lora_scale" in node:
            node["lora_scale"] = jnp.full(
                node["lora_scale"].shape, cfg_scale, dtype
            )

    # prefix-tuning: peft PREFIX_TUNING prompt_embeddings -> prefix_k/v
    if "prompt_embeddings" in tensors and "prefix_k" in layers:
        L, P, nkv, hd = layers["prefix_k"].shape
        emb = np.asarray(tensors["prompt_embeddings"], np.float32).reshape(
            P, L * 2, nkv, hd
        )
        layers["prefix_k"] = jnp.asarray(
            emb[:, 0::2].transpose(1, 0, 2, 3), dtype
        )
        layers["prefix_v"] = jnp.asarray(
            emb[:, 1::2].transpose(1, 0, 2, 3), dtype
        )
        loaded.append("prompt_embeddings")

    # llama_adapter: peft ADAPTION_PROMPT per-layer prompt+gate.  Only touch
    # the leaves when the adapter file actually carries adaption keys —
    # loading e.g. a LoRA-only adapter onto an adapter-equipped model must
    # not coerce the untouched prompt/gate leaves' dtype as a side effect.
    if "adaption_prompt" in layers and any(
        ".adaption_prompt" in k or ".adaption_gate" in k for k in tensors
    ):
        ap = np.asarray(layers["adaption_prompt"], np.float32).copy()
        ag = np.asarray(layers["adaption_gate"], np.float32).copy()
        touched_p = touched_g = False
        for l in range(ap.shape[0]):
            pre = f"base_model.model.model.layers.{l}.self_attn"
            kp, kg = f"{pre}.adaption_prompt", f"{pre}.adaption_gate"
            if kp in tensors:
                ap[l] = np.asarray(tensors[kp], np.float32).reshape(ap[l].shape)
                loaded.append(kp)
                touched_p = True
            if kg in tensors:
                ag[l] = float(np.asarray(tensors[kg]).reshape(()))
                loaded.append(kg)
                touched_g = True
        if touched_p:
            layers["adaption_prompt"] = jnp.asarray(ap, dtype)
        if touched_g:
            layers["adaption_gate"] = jnp.asarray(ag, dtype)
    return loaded


# ----------------------------------------------------------------------------
# 1. native train-state checkpoints (Orbax)
# ----------------------------------------------------------------------------

def save_train_state(path: str, state):
    """Orbax save of the full train state pytree (synchronous — the
    checkpointer is waited on and closed before returning)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def restore_train_state(path: str, abstract_state):
    """Orbax restore with resharding onto abstract_state's shardings.

    Leaves the template holds on a single device (the ``step`` scalar and
    any small replicated leaf created outside jit) would come back
    COMMITTED to that one device while the params are mesh-sharded — a
    mix the next jitted step rejects.  When the template carries a mesh,
    such leaves are restored replicated over it instead.
    """
    import jax
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = None
    for leaf in jax.tree_util.tree_leaves(abstract_state):
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding) and len(sh.mesh.devices.flat) > 1:
            mesh = sh.mesh
            break

    if mesh is not None:
        def target(leaf):
            sh = getattr(leaf, "sharding", None)
            if not isinstance(sh, NamedSharding):
                sh = NamedSharding(mesh, PartitionSpec())
            return jax.ShapeDtypeStruct(
                jnp.shape(leaf), leaf.dtype, sharding=sh
            )

        abstract_state = jax.tree_util.tree_map(target, abstract_state)

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(path, abstract_state)
    ckptr.close()
    return out
