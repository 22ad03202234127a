"""Flagship (1.5B) decode-memory plan — no hardware needed.

AOT-compiles the REAL serving decode program (merge -> prefill -> cached
beam/greedy loop, inference/generate.py) for a deviceless TPU topology at
the flagship decode config (reference settings: beam 4, max_new 200,
``ps-slm.py:660-675``) across batch sizes and weight/KV quantization
variants, and reports the compiler's per-device memory analysis vs the
chip's HBM.  This is how a serving deployment sizes its slot pool: the
largest batch whose compiled program fits IS the max servable slots.

    python benchmarks/memory_plan_decode.py                   # full sweep
    python benchmarks/memory_plan_decode.py --variant=int8 --batch=32
    python benchmarks/memory_plan_decode.py --num-beams=1 --topology=v5e:1x1

Prints one JSON line per (variant, batch) candidate, then a summary line
with the max fitting batch per variant.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.memory_plan import (  # noqa: E402
    ENC_OVER, FRAMES, HBM_BYTES, LLM_OVER, TEXT_LEN, abstract_model,
)

# reference decode settings (ps-slm.py:660-675): num_beams=4, max_new=200
VARIANTS = {
    # weight dtype/bits, kv_bits
    "bf16": dict(quant_bits=None, kv_bits=16),
    "int8": dict(quant_bits=8, kv_bits=16),
    "int4": dict(quant_bits=4, kv_bits=16),
    "kv8": dict(quant_bits=None, kv_bits=8),
    "int8kv8": dict(quant_bits=8, kv_bits=8),
}


def plan_decode(
    topology: str, batch: int, variant: str, num_beams: int = 4,
    max_new_tokens: int = 200,
) -> dict:
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.inference.generate import beam_generate, greedy_generate
    from ps_slm_tpu.models.tasu import prepare_merged

    vcfg = VARIANTS[variant]
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=topology
    )
    # serving is per-chip: plan on ONE device of the topology (replicated)
    mesh = Mesh(np.asarray(topo.devices[:1]), ("data",))

    dtype = jax.numpy.bfloat16
    tc = TrainConfig(
        ctc_posterior=True, do_psd=True, freeze_llm=True, freeze_encoder=True,
    )
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=ENC_OVER["vocab_size"], llm_dim=LLM_OVER["hidden_size"],
        encoder_projector_ds_rate=1,
        llm_config_overrides=LLM_OVER, encoder_config_overrides=ENC_OVER,
    )
    model = abstract_model(tc, mc, dtype)
    model.speech_token_id = LLM_OVER["vocab_size"] - 2
    model.use_flash = False  # decode shapes never reach the flash threshold

    if vcfg["quant_bits"]:
        from ps_slm_tpu.models.quantization import quantize_llm

        model.params = dict(model.params)
        model.params["llm"] = jax.eval_shape(
            lambda p: quantize_llm(p, bits=vcfg["quant_bits"]), model.params["llm"]
        )

    repl = NamedSharding(mesh, P())

    def with_sharding(leaf):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=repl)

    params_sds = jax.tree_util.tree_map(with_sharding, model.params)

    def bsds(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt, sharding=repl)

    batch_sds = {
        "input_ids": bsds((batch, TEXT_LEN), np.int32),
        "attention_mask": bsds((batch, TEXT_LEN), bool),
        "input_features": bsds((batch, FRAMES, ENC_OVER["input_size"]), dtype),
        "input_feature_length": bsds((batch,), np.int32),
    }
    eos = LLM_OVER["vocab_size"] - 1

    def decode_fn(params, b):
        merged = prepare_merged(
            model, params, b, None, left_padding=True, generate_mode=True,
        )
        if num_beams > 1:
            return beam_generate(
                params["llm"], model.llm_cfg,
                merged.embeds, merged.attention_mask, merged.position_ids,
                max_new_tokens=max_new_tokens, eos_token_id=eos,
                num_beams=num_beams, kv_bits=vcfg["kv_bits"],
            )
        return greedy_generate(
            params["llm"], model.llm_cfg,
            merged.embeds, merged.attention_mask, merged.position_ids,
            None, max_new_tokens=max_new_tokens, eos_token_id=eos,
            kv_bits=vcfg["kv_bits"],
        )

    compiled = jax.jit(decode_fn).lower(params_sds, batch_sds).compile()
    ma = compiled.memory_analysis()

    gen = topology.split(":")[0]
    hbm = HBM_BYTES.get(gen)
    per_dev = (
        ma.argument_size_in_bytes + ma.output_size_in_bytes
        - ma.alias_size_in_bytes + ma.temp_size_in_bytes
        + ma.generated_code_size_in_bytes
    )
    return {
        "metric": "decode_memory_plan",
        "topology": topology,
        "variant": variant,
        "batch": batch,
        "num_beams": num_beams,
        "max_new_tokens": max_new_tokens,
        "frames": FRAMES,
        "argument_gb": round(ma.argument_size_in_bytes / 2 ** 30, 3),
        "temp_gb": round(ma.temp_size_in_bytes / 2 ** 30, 3),
        "total_per_device_gb": round(per_dev / 2 ** 30, 3),
        "hbm_gb": round(hbm / 2 ** 30, 1) if hbm else None,
        "fits": bool(per_dev < hbm) if hbm else None,
        "headroom_gb": round((hbm - per_dev) / 2 ** 30, 3) if hbm else None,
    }


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    topology = "v5e:2x2"
    num_beams = 4
    max_new = 200
    batches = None
    variants = list(VARIANTS)
    for a in argv:
        if a.startswith("--topology="):
            topology = a.split("=", 1)[1]
        elif a.startswith("--num-beams="):
            num_beams = int(a.split("=", 1)[1])
        elif a.startswith("--max-new="):
            max_new = int(a.split("=", 1)[1])
        elif a.startswith("--batch="):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--variant="):
            variants = a.split("=", 1)[1].split(",")

    if batches is None:
        batches = [8, 16, 32, 48, 64]

    best: dict = {}
    for variant in variants:
        for b in batches:
            try:
                r = plan_decode(topology, b, variant, num_beams, max_new)
            except Exception as e:  # OOM-at-compile etc.
                r = {
                    "metric": "decode_memory_plan", "topology": topology,
                    "variant": variant, "batch": b,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            print(json.dumps(r), flush=True)
            if r.get("fits"):
                best[variant] = max(best.get(variant, 0), b)
            elif r.get("fits") is False and best.get(variant, 0) < b:
                break  # larger batches won't fit either
    print(json.dumps({
        "metric": "decode_memory_plan_summary",
        "topology": topology, "num_beams": num_beams,
        "max_new_tokens": max_new,
        "max_fitting_batch": best,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
