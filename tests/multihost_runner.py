"""Subprocess runner for the real jax.distributed multi-host test.

Each process owns 8 // num_processes virtual CPU devices and joins a gRPC
coordinator; the jitted train step then runs cross-process GSPMD collectives
— the path the reference only exercised on a live NCCL cluster
(scripts/finetune_deespeed_sensevoice.sh:109-121).

Invoked by tests/test_multihost.py; prints one ``loss <v>`` line per step.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default="localhost:9876")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--mesh", default=None,
                    help='JSON mesh shape, e.g. {"pipe": 2, "data": 4}')
    args = ap.parse_args()

    n_local = 8 // args.num_processes
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    assert len(jax.devices()) == 8, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models.tasu import model_factory, trainable_mask
    from ps_slm_tpu.parallel import mesh as meshlib
    from ps_slm_tpu.training.step import make_train_step
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )

    SPEECH = 250
    tc = TrainConfig(
        ctc_posterior=True, gt_emb=True, gt_emb_noise=False,
        freeze_llm=True, freeze_encoder=True, lr=1e-3,
        warmup_steps=2, total_steps=100,
    )
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    model.speech_token_id = SPEECH
    model.use_flash = False

    import json

    mesh_shape = json.loads(args.mesh) if args.mesh else None
    mesh = meshlib.build_mesh(mesh_shape)
    if mesh.shape.get("pipe", 1) > 1:
        # cross-process ppermute path (parallel/pipeline.py)
        model.mesh = mesh
        model.pp_microbatches = 2
    model.params = meshlib.shard_params(model.params, mesh)
    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)
    step = make_train_step(model, tx, trainable)
    key = jax.random.PRNGKey(0)

    b, s = 8, 12
    for t in range(args.steps):
        rng = np.random.default_rng(100 + t)  # same global batch on all hosts
        ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
        ids[:, 3] = SPEECH
        labels = ids.copy()
        labels[:, :5] = -100
        gt = rng.integers(1, 11, size=(b, 6)).astype(np.int32)
        gbatch = {
            "input_ids": ids, "attention_mask": np.ones((b, s), bool),
            "labels": labels, "gt_ids": gt,
            "gt_lens": np.full((b,), 6, np.int32),
            "batch_valid": np.ones((b,), bool),
        }
        if mesh.shape.get("pipe", 1) > 1:
            # pipe spans processes: the batch is pipe-REPLICATED, so every
            # process addresses all data shards and must feed the full
            # global batch (per-host GlobalBatcher would use the host's
            # data-axis group, not its raw process id)
            local = gbatch
        else:
            # host shard: the GlobalBatcher slice semantics (host h keeps
            # the h-th contiguous block, matching device order so the
            # assembled global array equals the single-process batch)
            per = next(iter(gbatch.values())).shape[0] // args.num_processes
            lo = args.process_id * per
            local = {k: v[lo: lo + per] for k, v in gbatch.items()}
        dev = meshlib.shard_batch(
            {k: jnp.asarray(v) for k, v in local.items()}, mesh
        )
        state, metrics = step(state, dev, key)
        print(f"loss {float(metrics['loss']):.6f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
