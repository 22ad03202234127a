"""Subprocess runner driving the REAL ``cli/finetune`` entry under
multi-process ``jax.distributed``.

Where ``multihost_runner.py`` drives the jitted step directly, this runs
the full launcher path — config parse, model build, per-process
GlobalBatcher shards, the training loop, Orbax cross-process sharded save
(``save_last``), the host-0 reference-format export (which must allgather
cross-process shards first), and optionally a cross-process resume — the
wiring the reference only exercised via its DeepSpeed hostfile launch
(scripts/finetune_deespeed_sensevoice.sh:109-121).

Invoked by tests/test_multihost.py::test_cli_finetune_two_process_*.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default="localhost:9876")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out-name", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--resume-from", default=None)
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

    from ps_slm_tpu.cli.finetune import main as finetune_main

    w = args.workdir
    out_dir = os.path.join(w, args.out_name)
    argv = [
        "++model_config.llm_path=",
        "++model_config.encoder_projector=linear-silu",
        "++model_config.encoder_dim=11",
        "++model_config.llm_dim=64",
        '++model_config.encoder_config_overrides={"input_size": 560}',
        "++train_config.ctc_posterior=true",
        "++train_config.do_psd=false",
        # train every module so the export covers encoder+projector+llm
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.mixed_precision=false",
        '++train_config.mesh_shape={"data": 4, "fsdp": 2}',
        "++train_config.fsdp_min_size=1024",
        "++train_config.lr=1e-3",
        "++train_config.warmup_steps=2",
        "++train_config.total_steps=100",
        "++train_config.run_validation=false",
        "++train_config.save_last=true",
        f"++train_config.num_epochs={args.epochs}",
        f"++train_config.output_dir={out_dir}",
        f"++dataset_config.multitask_prompt_path={w}/multiprompt.jsonl",
        f"++dataset_config.train_scp_file_path={w}/train",
        f"++dataset_config.dev_scp_file_path={w}/dev",
        f"++dataset_config.test_scp_file_path={w}/test",
        "++dataset_config.train_max_frame_length=200",
        "++dataset_config.feature_bucket=16",
        "++dataset_config.token_bucket=8",
        f"++log_config.log_file={out_dir}.p{args.process_id}.log",
        "++log_config.log_interval=1",
    ]
    if args.resume_from:
        argv.append(f"++train_config.resume_from={args.resume_from}")

    rc = finetune_main(argv)
    print(json.dumps({"rc": rc, "process": args.process_id}), flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
