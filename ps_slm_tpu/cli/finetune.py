"""Training entry point.

Replaces ``Multitask/finetune_deepspeed.py`` (Hydra CLI + deepspeed.initialize
+ DataLoaders + train, :40-228).  Usage mirrors the reference launch script
(``scripts/finetune_deespeed_sensevoice.sh:25-45``):

    python -m ps_slm_tpu.cli.finetune \
        ++model_config.llm_path=/path/Qwen2.5-1.5B-Instruct \
        ++model_config.encoder_path=/path/SenseVoiceSmall \
        ++model_config.encoder_projector=linear-silu \
        ++train_config.ctc_posterior=true ++train_config.gt_emb=true \
        ++dataset_config.train_scp_file_path=/path/train/ ...

Multi-host: set PS_NUM_HOSTS / PS_HOST_ID (or rely on jax.distributed env);
no hostfiles (the reference generated DeepSpeed hostfiles,
``scripts/finetune_deespeed_sensevoice.sh:109-121``).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp


def main(argv=None):
    from ps_slm_tpu.config import RunConfig, dump, parse_cli
    from ps_slm_tpu.data.spm import SenseVoiceTokenizer
    from ps_slm_tpu.data.tokenizer import load_tokenizer
    from ps_slm_tpu.models.tasu import trainable_mask
    from ps_slm_tpu.parallel import mesh as meshlib
    from ps_slm_tpu.registry import get_dataset_factory, get_model_factory
    from ps_slm_tpu.training import checkpoint as ckpt
    from ps_slm_tpu.training.loop import train
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )
    from ps_slm_tpu.utils.logging import MetricLogger, setup_logger

    cfg = parse_cli(argv if argv is not None else sys.argv[1:], RunConfig())
    tc, mc, dc, lc = (
        cfg.train_config, cfg.model_config, cfg.dataset_config, cfg.log_config
    )

    os.makedirs(tc.output_dir, exist_ok=True)
    logger = setup_logger("finetune", lc.log_file)
    dump(cfg, os.path.join(tc.output_dir, "resolved_config.json"))

    # multi-host identity (jax.distributed when launched on a real pod)
    if "PS_COORDINATOR" in os.environ:
        jax.distributed.initialize()
    num_hosts = int(os.environ.get("PS_NUM_HOSTS", jax.process_count()))
    host_id = int(os.environ.get("PS_HOST_ID", jax.process_index()))

    dtype = jnp.bfloat16 if tc.mixed_precision else jnp.float32
    tokenizer = load_tokenizer(mc.llm_path or None)
    encoder_tokenizer = None
    if mc.encoder_bpe_path or mc.encoder_path:
        try:
            encoder_tokenizer = SenseVoiceTokenizer(
                mc.encoder_bpe_path or mc.encoder_path
            )
        except (FileNotFoundError, OSError):
            logger.warning("no encoder BPE model found; gt_ids disabled")

    model = get_model_factory(mc.factory)(
        tc, mc, rng=jax.random.PRNGKey(tc.seed), dtype=dtype
    )
    model.speech_token_id = tokenizer.speech_token_id
    model.pad_token_id = tokenizer.pad_token_id

    if mc.encoder_path:
        cmvn_path = os.path.join(mc.encoder_path, "am.mvn")
        if os.path.exists(cmvn_path):
            from ps_slm_tpu.ops.fbank import load_cmvn

            model.cmvn = load_cmvn(cmvn_path)
    model.fbank_cfg = dc.fbank

    if cfg.ckpt_path:
        loaded = ckpt.import_reference_checkpoint(model, cfg.ckpt_path, dtype)
        logger.info(f"loaded {len(loaded)} tensors from {cfg.ckpt_path}")

    if cfg.peft_ckpt and tc.use_peft:
        # HF-PEFT adapter resume (reference ps-slm.py:110-113)
        n = len(ckpt.import_peft_adapters(model, cfg.peft_ckpt, dtype))
        logger.info(f"loaded {n} adapter tensors from {cfg.peft_ckpt}")

    if cfg.debug:
        import pdb

        pdb.set_trace()

    mesh = meshlib.build_mesh(tc.mesh_shape)
    model.mesh = mesh if len(jax.devices()) > 1 else None
    model.pp_microbatches = tc.pp_microbatches
    model.params = meshlib.shard_params(model.params, mesh, tc.fsdp_min_size)
    trainable = trainable_mask(model, tc)
    from ps_slm_tpu.utils.logging import log_model_size

    log_model_size(logger, model, trainable)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)

    if tc.resume_from:
        state = ckpt.restore_train_state(tc.resume_from, state)
        logger.info(f"resumed train state from {tc.resume_from}")

    dataset_factory = get_dataset_factory(dc.factory)
    fixed_bs = (
        tc.batch_size_training
        if tc.batching_strategy != "dynamic" else None
    )
    # pad each host's batch to its device count so the batch axis divides
    # the mesh's data×fsdp sharding (padded rows are loss-masked)
    batch_axes = mesh.shape["data"] * mesh.shape["fsdp"]
    batch_multiple = max(1, batch_axes // num_hosts)

    def train_batches(epoch, skip_batches=0):
        return iter(dataset_factory(
            dc, tokenizer, "train", encoder_tokenizer=encoder_tokenizer,
            num_hosts=num_hosts, host_id=host_id,
            fixed_batch_size=fixed_bs, batch_multiple=batch_multiple,
            seed=tc.seed + epoch,  # fresh prompt draws per epoch
            skip_batches=skip_batches,
        ))

    eval_batches = None
    if dc.dev_scp_file_path:
        eval_bs = (
            tc.val_batch_size
            if tc.batching_strategy != "dynamic" else None
        )

        def eval_batches():
            return iter(dataset_factory(
                dc, tokenizer, "val", encoder_tokenizer=encoder_tokenizer,
                num_hosts=num_hosts, host_id=host_id,
                fixed_batch_size=eval_bs,
                batch_multiple=batch_multiple,
            ))

    def checkpoint_fn(state, tag):
        path = os.path.join(tc.output_dir, tag)
        ckpt.save_train_state(os.path.join(path, "state"), state)
        if jax.process_count() > 1:
            # params are cross-process sharded; the reference-format export
            # needs host-local arrays (the rank-0 zero->fp32 consolidation
            # analogue, checkpoint_handler.py:169-182).  allgather is a
            # collective: EVERY process participates, host 0 writes.
            from jax.experimental import multihost_utils

            host_params = multihost_utils.process_allgather(
                state.params, tiled=True
            )
        else:
            host_params = state.params
        if host_id == 0:
            model.params = host_params
            exclude = []
            if tc.freeze_llm and not tc.use_peft:
                exclude.append("llm")
            if tc.freeze_encoder:
                exclude.append("encoder")
            if tc.freeze_projector:
                exclude.append("projector")
            ckpt.export_reference_checkpoint(
                model, os.path.join(path, "pytorch_model.bin"),
                exclude=tuple(exclude),
            )
            if tc.use_peft:
                ckpt.export_peft_adapters(
                    model, os.path.join(path, "adapter")
                )

    metric_logger = MetricLogger(lc)
    try:
        state, history = train(
            model, state, tx, tc, lc,
            train_batches, eval_batches, mesh,
            trainable=trainable,
            logger=logger, metric_logger=metric_logger,
            checkpoint_fn=checkpoint_fn,
        )
    finally:
        metric_logger.close()
    logger.info(f"done; history: {history}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
