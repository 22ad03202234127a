"""Closed-loop correctness: train -> decode -> WER on synthetic speech.

The reference's de-facto correctness bar is the decode->clean->WER pipeline
(`/root/reference/Multitask/scripts/decode_sensevoice.sh:60-97`) run on
released checkpoints.  Without asset access, this script closes the loop
self-contained: it fabricates a deterministic *audio-grounded* task — a
16-word vocabulary where each word is a distinct pure tone, utterances are
unseen random word sequences — then drives the REAL production surfaces
end to end:

  1. tone-coded wav ark + JSONL manifests (train/dev/test, disjoint
     sequences; every utterance appears under THREE tasks — "ASR",
     a "REV" reverse-order task, and a "TRN" word-for-word translation
     into a disjoint target vocabulary (the EN2ZH analogue) — so
     prompt-conditioned multitasking is exercised, not just
     transcription) + a tiny word-level HF tokenizer + a tiny random-init
     HF Qwen2 checkpoint (exercising the safetensors load path),
  2. ``cli/finetune`` on the audio-TASU branch (fbank -> SenseVoice encoder
     -> CTC posterior -> projector -> LLM -> merge -> CE), nothing frozen,
  3. ``cli/decode`` (beam 4, the reference default) from the exported
     ``pytorch_model.bin``,
  4. ``tools/clean_marks`` + ``tools/wer`` scoring on held-out utterances.

A model that can only memorize prompts scores ~90% WER here; driving WER
to ~0 proves the assembled framework *learns speech from audio*.  Run on
the real chip:

    python benchmarks/closed_loop.py            # ~5 min, prints one JSON line

or on CPU (tests/test_closed_loop.py uses run() directly):

    python benchmarks/closed_loop.py --platform cpu
"""

from __future__ import annotations

import glob
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 16000
WORDS = [
    "red", "blue", "green", "gold", "iron", "wolf", "hawk", "bear",
    "oak", "elm", "ash", "fern", "moon", "star", "rain", "snow",
]
# target-language vocabulary for the TRN task: disjoint from WORDS, so the
# model must emit tokens that never appear in the CTC/audio stream — the
# closed-loop analogue of the reference's EN2ZH translation task
# (speech_dataset_large.py:151-160 prompts per task; BASELINE.md quality row)
ZH_WORDS = [
    "hong", "lan", "lyu", "jin", "tie", "lang", "ying", "xiong",
    "xiang", "yushu", "cen", "jue", "yue", "xing", "yu", "xue",
]
TONE_SEC = 0.25
GAP_SEC = 0.05


def synth_utterance(words, rng) -> np.ndarray:
    """Each word is a pure tone at a word-specific frequency (mel-spaced
    300..3000 Hz) with a small random phase; words separated by silence."""
    chunks = [np.zeros(int(GAP_SEC * RATE), np.float32)]
    for w in words:
        i = WORDS.index(w)
        freq = 300.0 * (10 ** (i / 15.0))  # log-spaced 300..3000 Hz
        t = np.arange(int(TONE_SEC * RATE)) / RATE
        phase = rng.uniform(0, 2 * np.pi)
        tone = 0.3 * np.sin(2 * np.pi * freq * t + phase)
        chunks += [tone.astype(np.float32),
                   np.zeros(int(GAP_SEC * RATE), np.float32)]
    return np.concatenate(chunks)


def build_fixtures(workdir: str, n_train=384, n_dev=16, n_test=32, seed=0,
                   multitask=True):
    """Wav ark + manifests with *sequence-disjoint* splits.

    ``multitask``: each utterance also gets two more manifest rows — task
    "REV" (target = the word sequence REVERSED) and task "TRN" (target =
    the word-for-word translation into the disjoint ZH_WORDS vocabulary).
    Same audio, different prompt, different required output: REV tests
    prompt-conditioned reordering, TRN tests emitting tokens that never
    appear in the audio-grounded source vocabulary at all.  Together they
    are the closed-loop analogue of the reference's multitask framing
    (ASR + EN2ZH etc., speech_dataset_large.py:151-160)."""
    from ps_slm_tpu.data import audio_io

    rng = np.random.default_rng(seed)
    seen = set()

    def draw():
        while True:
            n = int(rng.integers(3, 7))
            seq = tuple(rng.choice(len(WORDS), size=n))
            if seq not in seen:
                seen.add(seq)
                return [WORDS[i] for i in seq]

    splits = {"train": n_train, "dev": n_dev, "test": n_test}
    entries, manifests = {}, {}
    for split, n in splits.items():
        manifests[split] = []
        for j in range(n):
            key = f"{split}{j}"
            words = draw()
            entries[key] = (RATE, synth_utterance(words, rng))
            manifests[split].append((key, "ASR", " ".join(words)))
            if multitask:
                manifests[split].append(
                    (key, "REV", " ".join(reversed(words)))
                )
                manifests[split].append((
                    key, "TRN",
                    " ".join(ZH_WORDS[WORDS.index(w)] for w in words),
                ))

    ark = os.path.join(workdir, "wav.ark")
    offsets = audio_io.write_kaldi_wav_ark(ark, entries)
    for split, rows in manifests.items():
        d = os.path.join(workdir, split)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "multitask.jsonl"), "w") as f:
            for key, task, text in rows:
                row_key = key if task == "ASR" else f"{key}_{task.lower()}"
                f.write(json.dumps({
                    "key": row_key, "path": f"{ark}:{offsets[key]}",
                    "target": text, "GT": text, "task": task,
                }) + "\n")
    prompt = os.path.join(workdir, "multiprompt.jsonl")
    with open(prompt, "w") as f:
        f.write(json.dumps({"task": "ASR", "prompt": "transcribe"}) + "\n")
        f.write(json.dumps({"task": "REV", "prompt": "reverse"}) + "\n")
        f.write(json.dumps({"task": "TRN", "prompt": "translate"}) + "\n")


def build_llm_fixture(workdir: str, hidden=64, layers=2) -> str:
    """Tiny word-level HF tokenizer + random-init HF Qwen2 checkpoint so the
    closed loop exercises the real safetensors/AutoTokenizer load paths
    (deterministic across the train and decode processes, unlike the
    hash-based StubTokenizer)."""
    import torch
    import transformers
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    path = os.path.join(workdir, "tiny_llm")
    os.makedirs(path, exist_ok=True)

    specials = ["<unk>", "</s>", "<speech>"]
    vocab = {
        t: i for i, t in enumerate(
            specials + ["transcribe", "reverse", "translate"]
            + WORDS + ZH_WORDS
        )
    }
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", unk_token="<unk>",
        pad_token="</s>",
        additional_special_tokens=["<speech>"],
    )
    fast.save_pretrained(path)

    torch.manual_seed(0)
    cfg = transformers.Qwen2Config(
        vocab_size=len(vocab) + 4,  # headroom over the tokenizer
        hidden_size=hidden, intermediate_size=2 * hidden,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=2, head_dim=hidden // 4,
        max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    transformers.Qwen2ForCausalLM(cfg).save_pretrained(path)
    return path


def _args(workdir, llm_path, out_dir, steps_cfg, frame_budget=2000):
    return [
        f"++model_config.llm_path={llm_path}",
        "++model_config.encoder_projector=linear-silu",
        "++model_config.encoder_dim=32",
        "++model_config.llm_dim=64",
        ('++model_config.encoder_config_overrides='
         '{"input_size": 560, "output_size": 32, "attention_heads": 2, '
         '"linear_units": 64, "num_blocks": 3, "tp_blocks": 0, '
         '"vocab_size": 32}'),
        # audio-TASU: real CTC posterior into the projector (SURVEY §2.B.3)
        "++train_config.ctc_posterior=true",
        "++train_config.do_psd=false",
        "++train_config.gt_emb=false",
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.freeze_projector=false",
        "++train_config.mixed_precision=false",
        "++train_config.num_beams=4",
        "++train_config.max_new_tokens=12",
        f"++dataset_config.multitask_prompt_path={workdir}/multiprompt.jsonl",
        f"++dataset_config.train_scp_file_path={workdir}/train",
        f"++dataset_config.dev_scp_file_path={workdir}/dev",
        f"++dataset_config.test_scp_file_path={workdir}/test",
        "++dataset_config.prompt_style={} <speech> ",
        f"++dataset_config.train_max_frame_length={frame_budget}",
        "++dataset_config.eval_max_frame_length=96",
        "++dataset_config.feature_bucket=48",
        "++dataset_config.token_bucket=16",
        f"++log_config.log_file={workdir}/train.log",
        "++log_config.log_interval=20",
        f"++train_config.output_dir={out_dir}",
    ] + steps_cfg


def run(workdir: str, *, epochs=40, lr=2e-3, seed=0, n_train=1024,
        frame_budget=2000) -> dict:
    """Build fixtures, train, decode held-out, score.  Returns the metrics
    dict (wer in percent, plus counts from tools/wer).

    n_train=1024 random sequences over a 16-word vocab makes sequence
    memorization useless (16^3..16^6 possible utterances): teacher-forced
    accuracy can only transfer to held-out WER through the audio."""
    from ps_slm_tpu.cli.decode import main as decode_main
    from ps_slm_tpu.cli.finetune import main as finetune_main
    from ps_slm_tpu.tools.clean_marks import clean_file
    from ps_slm_tpu.tools.wer import score_files

    os.makedirs(workdir, exist_ok=True)
    build_fixtures(workdir, n_train=n_train, seed=seed)
    llm_path = build_llm_fixture(workdir)
    out_dir = os.path.join(workdir, "out")

    steps = [
        f"++train_config.num_epochs={epochs}",
        "++train_config.validation_interval=10",
        f"++train_config.lr={lr}",
        "++train_config.warmup_steps=50",
        "++train_config.total_steps=1000",
        f"++train_config.seed={seed}",
    ]
    rc = finetune_main(
        _args(workdir, llm_path, out_dir, steps, frame_budget)
    )
    assert rc == 0

    ckpts = sorted(
        glob.glob(os.path.join(out_dir, "step_*")),
        key=lambda p: int(p.rsplit("_", 1)[1]),
    )
    assert ckpts, f"no checkpoint under {out_dir}"
    ckpt = os.path.join(ckpts[-1], "pytorch_model.bin")

    decode_log = os.path.join(workdir, "decode", "test")
    rc = decode_main(_args(workdir, llm_path, out_dir, [
        f"ckpt_path={ckpt}", f"decode_log={decode_log}",
    ]))
    assert rc == 0

    # the reference scoring pipeline (decode_sensevoice.sh:94-97)
    clean_file(decode_log + "_pred")
    clean_file(decode_log + "_gt")
    buf = io.StringIO()
    result = score_files(
        decode_log + "_gt", decode_log + "_pred",
        char=True, verbose=True, stream=buf,
    )
    with open(os.path.join(workdir, "wer_report.txt"), "w") as f:
        f.write(buf.getvalue())

    # per-task WER (key suffix encodes the task: "", "_rev", "_trn")
    def _task_of(key):
        return ("REV" if key.endswith("_rev")
                else "TRN" if key.endswith("_trn") else "ASR")

    per_task = {}
    with open(decode_log + "_gt") as f:
        gt_rows = [l.split("\t", 1) for l in f.read().splitlines()]
    with open(decode_log + "_pred") as f:
        pred_rows = [l.split("\t", 1) for l in f.read().splitlines()]
    tasks = sorted({_task_of(k) for k, _ in gt_rows})
    if len(tasks) > 1:
        for task in tasks:
            gtp = decode_log + f"_gt.{task}"
            prp = decode_log + f"_pred.{task}"
            with open(gtp, "w") as f:
                f.writelines(f"{k}\t{t}\n" for k, t in gt_rows
                             if _task_of(k) == task)
            with open(prp, "w") as f:
                f.writelines(f"{k}\t{t}\n" for k, t in pred_rows
                             if _task_of(k) == task)
            per_task[task] = score_files(
                gtp, prp, char=True, verbose=False, stream=io.StringIO(),
            )["wer"]
    result["per_task_wer"] = per_task
    result["ckpt"] = ckpt
    return result


def pool_compare(workdir: str, ckpt: str, *, slots=8, repeats=3) -> dict:
    """Continuous greedy pool vs static batched greedy on the TRAINED
    closed-loop checkpoint.

    docs/PERF.md's pool section noted the pool's ragged-completion win is
    something "random-init weights cannot exhibit — re-measure on trained
    checkpoints": this is that measurement.  The trained model emits real
    EOS at 3-6 word answers under the 12-token cap, so slot refills happen
    on genuine completion raggedness rather than `stop_after` simulation.
    Outputs are asserted identical per key across the two modes.
    """
    import time

    import jax
    import jax.numpy as jnp

    from ps_slm_tpu.config import RunConfig, parse_cli
    from ps_slm_tpu.data.dataset import Collator, MultiTaskDataset
    from ps_slm_tpu.data.tokenizer import load_tokenizer
    from ps_slm_tpu.inference.continuous import ContinuousGreedyDecoder
    from ps_slm_tpu.inference.generate import generate
    from ps_slm_tpu.registry import get_model_factory
    from ps_slm_tpu.training import checkpoint as ckpt_lib

    llm_path = os.path.join(workdir, "tiny_llm")
    cfg = parse_cli(
        _args(workdir, llm_path, os.path.join(workdir, "out"), []),
        RunConfig(),
    )
    tc, mc, dc = cfg.train_config, cfg.model_config, cfg.dataset_config
    dc.inference_mode = True
    dtype = jnp.bfloat16 if tc.mixed_precision else jnp.float32
    tokenizer = load_tokenizer(mc.llm_path or None)
    model = get_model_factory(mc.factory)(
        tc, mc, rng=jax.random.PRNGKey(0), dtype=dtype
    )
    model.speech_token_id = tokenizer.speech_token_id
    model.pad_token_id = tokenizer.pad_token_id
    model.fbank_cfg = dc.fbank
    ckpt_lib.import_reference_checkpoint(model, ckpt, dtype)

    ds = MultiTaskDataset(dc, tokenizer, "test")
    coll = Collator(tokenizer, dc, inference_mode=True)
    samples = list(ds)
    eos = tokenizer.eos_token_id
    max_new = tc.max_new_tokens

    def jb_of(rows):
        hb = coll(rows)
        return {
            k: jnp.asarray(v) for k, v in hb.items()
            if isinstance(v, np.ndarray)
        }

    chunks = [
        (samples[i: i + slots], jb_of(samples[i: i + slots]))
        for i in range(0, len(samples), slots)
    ]
    requests = [(s.key, jb_of([s])) for s in samples]

    def trim(row):
        out = []
        for t in row:
            if int(t) == eos:
                break
            out.append(int(t))
        return out

    def run_static():
        res = {}
        for rows, jb in chunks:
            out = np.asarray(generate(
                model, model.params, jb, eos_token_id=eos,
                num_beams=1, max_new_tokens=max_new,
            ))
            for s, row in zip(rows, out):
                res[s.key] = trim(row)
        return res

    def run_pool():
        dec = ContinuousGreedyDecoder(
            model, model.params, num_slots=slots,
            prefill_len=dc.eval_max_frame_length, max_new_tokens=max_new,
            eos_token_id=eos, sync_every=tc.decode_sync_every,
        )
        return {
            k: [int(t) for t in v] for k, v in dec.run(iter(requests))
        }

    static_res = run_static()   # compile warmup, untimed
    pool_res = run_pool()
    assert static_res == pool_res, "pool output diverged from static greedy"

    times = {}
    for name, fn in (("static", run_static), ("pool", run_pool)):
        t0 = time.perf_counter()
        for _ in range(repeats):
            fn()
        times[name] = (time.perf_counter() - t0) / repeats

    lengths = sorted(len(v) for v in static_res.values())
    tokens = sum(lengths)
    return {
        "metric": "closed_loop_pool_vs_static",
        "n_requests": len(samples),
        "tokens": tokens,
        "completion_lengths": {
            "min": lengths[0], "max": lengths[-1],
            "mean": round(tokens / len(lengths), 2),
        },
        "static_tokens_per_sec": round(tokens / times["static"], 1),
        "pool_tokens_per_sec": round(tokens / times["pool"], 1),
        "speedup": round(times["static"] / times["pool"], 3),
        "slots": slots,
        "outputs_identical": True,
    }


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    workdir = "/tmp/ps_closed_loop"
    epochs = 50
    do_pool = "--pool-compare" in argv
    for a in argv:
        if a in ("--platform", "cpu", "--pool-compare"):
            continue
        if a.startswith("--workdir="):
            workdir = a.split("=", 1)[1]
        elif a.startswith("--epochs="):
            epochs = int(a.split("=", 1)[1])
    if "--platform" in argv and "cpu" in argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    result = run(workdir, epochs=epochs)
    print(json.dumps({
        "metric": "closed_loop_wer", "value": result["wer"],
        "unit": "%WER", "n_ref_tokens": result["all"],
        "per_task_wer": result["per_task_wer"],
        "ckpt": result["ckpt"],
    }))
    if do_pool:
        print(json.dumps(pool_compare(workdir, result["ckpt"])))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
