"""The TASU transfer experiment — the paradigm's headline claim, end to end.

The whole point of the reference (``ps-slm.py:337-409``: pseudo-posteriors
so the projector aligns *without audio*) is that TEXT-ONLY training
transfers to AUDIO decoding: simulate the encoder's CTC posterior from
ground-truth text during training, then at inference feed the projector the
*real* CTC posterior from a CTC-trained encoder.  This script composes that
loop on the closed-loop synthetic corpus (benchmarks/closed_loop.py):

  A. CTC-train the SenseVoice encoder on (audio, word ids) with
     ``sensevoice_asr.encoder_train_loss`` (SenseVoice.py:657-707 objective:
     CTC + rich-label CE) — its first end-to-end exercise,
  B. freeze it; train projector+LLM TEXT-ONLY through ``cli/finetune``
     with ``gt_emb=true, gt_emb_noise=true`` (ps-slm.py:459-468 semantics —
     no audio is read during this stage),
  C. decode AUDIO through the real encoder CTC posteriors with
     ``cli/decode`` (``ctc_posterior=true, do_psd=true`` — PSD collapses
     blank/repeat frames so the real posterior stream matches the
     pseudo-posterior's token-rate framing), score with
     clean_marks + tools/wer,
  D. report posterior-similarity metrics (tools/posterior_analysis.py
     JS/top1/edit) between the simulated and real posteriors — the
     mechanism explaining WHY the transfer works.

The encoder BPE model is a real sentencepiece ModelProto fabricated with
``spm.serialize_model_proto`` (word-atomic chain merges), so stage B/C use
the production ``SenseVoiceTokenizer`` -> ``gt_ids`` pipeline, not a stub.

    python benchmarks/tasu_transfer.py              # real chip, ~10 min
    python benchmarks/tasu_transfer.py --platform cpu --quick
"""

from __future__ import annotations

import glob
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.closed_loop import (  # noqa: E402
    RATE, build_fixtures, build_llm_fixture, make_vocab,
)

RICH = [0, 1, 2, 2]  # constant rich labels (ids echo encode_speech queries)


# ----------------------------------------------------------------------------
# encoder BPE fixture: word-atomic sentencepiece model
# ----------------------------------------------------------------------------

def build_encoder_bpe(workdir: str, n_words: int = 64) -> str:
    """Write ``chn_jpn_yue_eng_ko_spectok.bpe.model`` (the filename the
    production ``SenseVoiceTokenizer`` loads, data/spm.py:289-294) with one
    atomic piece per corpus word.

    BPE needs every intermediate merge, so each word contributes its
    ``▁``-prefixed prefixes with scores increasing in length — the longest
    merge always wins and ``encode("ba de")`` returns exactly one id per
    word."""
    from ps_slm_tpu.data import spm

    words, _ = make_vocab(n_words)
    pieces = [
        ("<blank>", 0.0, spm.TYPE_CONTROL),     # id 0 = CTC blank
        ("<unk>", 0.0, spm.TYPE_UNKNOWN),
        ("</s>", 0.0, spm.TYPE_CONTROL),
        ("<pad>", 0.0, spm.TYPE_CONTROL),
    ]
    seen = {p for p, _, _ in pieces}
    chars = sorted({c for w in words for c in w})
    for c in ["▁"] + chars:
        pieces.append((c, -100.0, spm.TYPE_NORMAL))
        seen.add(c)
    for w in sorted(words):
        for k in range(1, len(w) + 1):
            piece = "▁" + w[:k]
            if piece not in seen:
                seen.add(piece)
                # longer merges score higher -> whole words win
                pieces.append((piece, -50.0 + k, spm.TYPE_NORMAL))
    os.makedirs(workdir, exist_ok=True)
    path = os.path.join(workdir, "chn_jpn_yue_eng_ko_spectok.bpe.model")
    with open(path, "wb") as f:
        f.write(spm.serialize_model_proto(pieces))
    return workdir


# ----------------------------------------------------------------------------
# stage A: encoder CTC training (first end-to-end use of encoder_train_loss)
# ----------------------------------------------------------------------------

def _load_split(workdir: str, split: str):
    """(keys, waveforms, targets) for the ASR rows of a split."""
    from ps_slm_tpu.data import audio_io

    rows = []
    with open(os.path.join(workdir, split, "multitask.jsonl")) as f:
        for line in f:
            item = json.loads(line)
            if item["task"] != "ASR":
                continue
            path, off = audio_io.parse_path(item["path"])
            _, wav = audio_io.read_wav(path, off)
            rows.append((item["key"], wav.astype(np.float32), item["target"]))
    return rows


def train_encoder(
    workdir: str, enc_cfg, enc_tok, *, epochs=15, lr=2e-3, batch=16,
    seed=0, log=print, stop_at_ter=None, confuse_words=0,
):
    """CTC-train a SenseVoice encoder from scratch on the synthetic corpus.

    Objective = ``sensevoice_asr.encoder_train_loss`` (CTC over frames 4+,
    rich CE over the 4 query frames — SenseVoice.py:657-707).  Features are
    the production on-device front end (ops/fbank.frontend, no dither).
    Returns (trained encoder params, dev greedy token error rate).

    Two knobs make the encoder deliberately IMPERFECT — the regime the
    reference's CPS noise model was designed for (ps-slm.py:360-409):

    ``stop_at_ter``: early-stop once the dev token error rate drops to or
    below this value.  Measured caveat: an UNDERtrained encoder errs by
    being *soft* (entropy ~1.2, blank prob rarely crossing PSD's 0.9 drop
    threshold), which is a different failure mode from a converged real
    encoder's confident-but-wrong posteriors, and it breaks PSD framing
    outright (80.5% transfer WER at dev TER 0.027 in the round-5 probe).

    ``confuse_words``: train to convergence but on labels passed through a
    fixed k-word confusion map (word w -> word w', applied to every train
    utterance; dev/test stay clean).  The converged encoder then emits w'
    for w CONFIDENTLY — peaked posteriors with systematic substitution
    errors, the shape of real acoustic confusions — and dev TER lands near
    the corrupted-token fraction (~k/n_words), tunable into the 5-15%
    band VERDICT r4 weak #6 asks for."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from ps_slm_tpu.config import FbankConfig
    from ps_slm_tpu.models import sensevoice as sv
    from ps_slm_tpu.models.sensevoice_asr import encoder_train_loss
    from ps_slm_tpu.ops import fbank as fb

    fcfg = FbankConfig()
    rows = _load_split(workdir, "train")
    dev = _load_split(workdir, "dev")
    rng = np.random.default_rng(seed)

    if confuse_words:
        vocab = sorted({w for _, _, t in rows for w in t.split()})
        picked = list(rng.choice(len(vocab), size=confuse_words,
                                 replace=False))
        # rotate the picked set by one: a derangement on those k words
        conf = {vocab[picked[i]]: vocab[picked[(i + 1) % len(picked)]]
                for i in range(len(picked))}
        rows = [
            (k, wav, " ".join(conf.get(w, w) for w in t.split()))
            for k, wav, t in rows
        ]
        log(f"stage A label confusion map ({confuse_words} words): {conf}")

    def featurize(split_rows):
        """Host-padded features + encoder-vocab targets for a row group.

        Pad targets are bucketed (waveform to 0.5 s, text to 4 tokens) so
        the jitted step sees a handful of shapes instead of one per group —
        on TPU each novel shape is a fresh XLA compile."""
        wavs = [r[1] for r in split_rows]
        w_bucket = RATE // 2
        w_max = -(-max(len(w) for w in wavs) // w_bucket) * w_bucket
        wav = np.zeros((len(wavs), w_max), np.float32)
        wlen = np.zeros((len(wavs),), np.int32)
        for i, w in enumerate(wavs):
            wav[i, : len(w)] = w
            wlen[i] = len(w)
        feats, flens = fb.frontend(
            jnp.asarray(wav), jnp.asarray(wlen), None, cfg=fcfg, train=False,
        )
        tgt = [enc_tok.encode(r[2]) for r in split_rows]
        l_max = -(-max(len(t) for t in tgt) // 4) * 4
        text = np.zeros((len(tgt), 4 + l_max), np.int32)
        text[:, :4] = RICH
        tlens = np.zeros((len(tgt),), np.int32)
        for i, t in enumerate(tgt):
            text[i, 4: 4 + len(t)] = t
            tlens[i] = 4 + len(t)
        return np.asarray(feats), np.asarray(flens), text, tlens

    params = sv.init_params(jax.random.PRNGKey(seed), enc_cfg, jnp.float32)
    total_steps = epochs * max(len(rows) // batch, 1)
    warmup = min(50, max(total_steps // 10, 1))
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(total_steps, warmup + 1), lr * 0.05,
    ))
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, feats, flens, text, tlens):
        def loss_fn(p):
            q = sv.query_embedding(p, RICH)
            speech = jnp.concatenate([
                jnp.broadcast_to(
                    q[None], (feats.shape[0],) + q.shape
                ).astype(feats.dtype),
                feats,
            ], axis=1)
            out = encoder_train_loss(
                p, enc_cfg, speech, flens + 4, text, tlens,
            )
            return out["loss"], out
        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, out

    # bucket batch shapes: sort by duration, fixed-size groups
    order = sorted(range(len(rows)), key=lambda i: len(rows[i][1]))
    groups = [order[i: i + batch] for i in range(0, len(order), batch)]
    cached = [featurize([rows[i] for i in g]) for g in groups]

    # dev greedy CTC token error rate through the DECODE-path front half
    # (tasu.encode_speech), which is what stage C will actually run
    from ps_slm_tpu.models.tasu import encode_speech

    dev_feats, dev_flens, _, _ = featurize(dev)
    enc_jit = jax.jit(
        functools.partial(encode_speech, use_flash=False),
        static_argnums=(1,),
    )

    def dev_ter(p):
        _, post, lens = enc_jit(
            {"encoder": p}, enc_cfg,
            jnp.asarray(dev_feats), jnp.asarray(dev_flens),
        )
        post, lens = np.asarray(post), np.asarray(lens)
        errs = toks = 0
        for i, (_, _, target) in enumerate(dev):
            hyp = _collapse(np.argmax(post[i, : lens[i]], -1))
            ref = enc_tok.encode(target)
            errs += _edit(hyp, ref)
            toks += len(ref)
        return errs / max(toks, 1)

    ter = 1.0
    for ep in range(epochs):
        perm = rng.permutation(len(cached))
        losses = []
        for gi in perm:
            feats, flens, text, tlens = cached[gi]
            params, opt_state, out = step(
                params, opt_state, jnp.asarray(feats), jnp.asarray(flens),
                jnp.asarray(text), jnp.asarray(tlens),
            )
            losses.append(float(out["loss_ctc"]))
        log(f"stage A epoch {ep}: ctc {np.mean(losses):.4f}")
        if stop_at_ter is not None:
            ter = dev_ter(params)
            log(f"stage A epoch {ep} dev TER: {ter:.4f}")
            if ter <= stop_at_ter:
                log(
                    f"stage A early stop at epoch {ep}: dev TER {ter:.4f} "
                    f"<= {stop_at_ter} (deliberately imperfect encoder)"
                )
                return params, ter

    ter = dev_ter(params)
    log(f"stage A dev token error rate: {ter:.4f}")
    return params, ter


def _collapse(ids, blank=0):
    out, prev = [], -1
    for t in ids:
        if t != prev and t != blank:
            out.append(int(t))
        prev = t
    return out


def _edit(a, b):
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = min(
                dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
            prev, dp[j] = dp[j], cur
    return dp[-1]


def export_encoder_bin(workdir, enc_params, enc_cfg, mc_args) -> str:
    """Stage-A encoder -> reference-layout pytorch_model.bin via the
    production exporter (training/checkpoint.py)."""
    import jax

    from ps_slm_tpu.config import RunConfig, parse_cli
    from ps_slm_tpu.registry import get_model_factory
    from ps_slm_tpu.training.checkpoint import export_reference_checkpoint

    cfg = parse_cli(mc_args, RunConfig())
    model = get_model_factory(cfg.model_config.factory)(
        cfg.train_config, cfg.model_config, rng=jax.random.PRNGKey(0),
    )
    model.params["encoder"] = enc_params
    path = os.path.join(workdir, "encoder_ctc.bin")
    export_reference_checkpoint(model, path, exclude=("llm", "projector"))
    return path


# ----------------------------------------------------------------------------
# the full transfer loop
# ----------------------------------------------------------------------------

def _mc_args(workdir, llm_path, enc_vocab, bpe_dir):
    return [
        f"++model_config.llm_path={llm_path}",
        "++model_config.encoder_projector=linear-silu",
        f"++model_config.encoder_dim={enc_vocab}",
        "++model_config.llm_dim=64",
        f"++model_config.encoder_bpe_path={bpe_dir}",
        ('++model_config.encoder_config_overrides='
         '{"input_size": 560, "output_size": 32, "attention_heads": 2, '
         '"linear_units": 64, "num_blocks": 3, "tp_blocks": 0, '
         f'"vocab_size": {enc_vocab}}}'),
        f"++dataset_config.multitask_prompt_path={workdir}/multiprompt.jsonl",
        f"++dataset_config.train_scp_file_path={workdir}/train",
        f"++dataset_config.dev_scp_file_path={workdir}/dev",
        f"++dataset_config.test_scp_file_path={workdir}/test",
        "++dataset_config.prompt_style={} <speech> ",
        "++dataset_config.eval_max_frame_length=96",
        "++dataset_config.feature_bucket=48",
        "++dataset_config.token_bucket=16",
        "++train_config.mixed_precision=false",
        "++train_config.num_beams=4",
        "++train_config.max_new_tokens=12",
        f"++log_config.log_file={workdir}/transfer.log",
    ]


def run(workdir: str, *, n_words=64, noise_std=0.02, rate_var=0.2,
        n_train=1024, enc_epochs=15, text_epochs=40, lr=2e-3,
        frame_budget=2000, seed=0, log=print, stop_at_ter=None,
        confuse_words=0) -> dict:
    import torch

    from ps_slm_tpu.cli.decode import main as decode_main
    from ps_slm_tpu.cli.finetune import main as finetune_main
    from ps_slm_tpu.data.spm import SenseVoiceTokenizer
    from ps_slm_tpu.models import sensevoice as sv
    from ps_slm_tpu.tools.clean_marks import clean_file
    from ps_slm_tpu.tools.wer import score_files

    os.makedirs(workdir, exist_ok=True)
    build_fixtures(
        workdir, n_train=n_train, seed=seed, n_words=n_words,
        noise_std=noise_std, rate_var=rate_var, multitask=False,
    )
    llm_path = build_llm_fixture(workdir, n_words=n_words)
    bpe_dir = build_encoder_bpe(os.path.join(workdir, "enc_bpe"), n_words)
    enc_tok = SenseVoiceTokenizer(bpe_dir)
    enc_vocab = enc_tok.vocab_size
    mc_args = _mc_args(workdir, llm_path, enc_vocab, bpe_dir)

    enc_cfg = sv.SenseVoiceConfig.tiny(
        input_size=560, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=3, tp_blocks=0, vocab_size=enc_vocab,
    )

    # --- stage A: CTC encoder ---
    enc_params, ter = train_encoder(
        workdir, enc_cfg, enc_tok, epochs=enc_epochs, lr=lr, seed=seed,
        log=log, stop_at_ter=stop_at_ter, confuse_words=confuse_words,
    )
    enc_bin = export_encoder_bin(workdir, enc_params, enc_cfg, mc_args)

    # --- stage B: TEXT-ONLY projector+LLM training (no audio read) ---
    out_dir = os.path.join(workdir, "out_text_only")
    rc = finetune_main(mc_args + [
        "++train_config.ctc_posterior=true",
        "++train_config.gt_emb=true",
        "++train_config.gt_emb_noise=true",
        "++train_config.insert_prob=0.1",
        "++train_config.freeze_encoder=true",
        "++train_config.freeze_llm=false",
        "++train_config.freeze_projector=false",
        f"++train_config.num_epochs={text_epochs}",
        "++train_config.validation_interval=10",
        f"++train_config.lr={lr}",
        "++train_config.warmup_steps=50",
        "++train_config.total_steps=1000",
        f"++train_config.seed={seed}",
        f"++train_config.output_dir={out_dir}",
        f"++dataset_config.train_max_frame_length={frame_budget}",
        "++log_config.log_interval=20",
        f"ckpt_path={enc_bin}",
    ])
    assert rc == 0

    ckpts = sorted(
        glob.glob(os.path.join(out_dir, "step_*")),
        key=lambda p: int(p.rsplit("_", 1)[1]),
    )
    assert ckpts, f"no checkpoint under {out_dir}"
    text_bin = os.path.join(ckpts[-1], "pytorch_model.bin")

    # merge stage-A encoder + stage-B projector/LLM (the trainer's export
    # excludes frozen modules, exclude_frozen semantics)
    merged = os.path.join(workdir, "transfer_model.bin")
    tensors = torch.load(enc_bin, map_location="cpu", weights_only=True)
    tensors.update(
        torch.load(text_bin, map_location="cpu", weights_only=True)
    )
    torch.save(tensors, merged)

    # --- stage C: decode real AUDIO through the real CTC posteriors ---
    decode_log = os.path.join(workdir, "decode", "test")
    rc = decode_main(mc_args + [
        "++train_config.ctc_posterior=true",
        "++train_config.gt_emb=false",
        "++train_config.do_psd=true",
        f"ckpt_path={merged}", f"decode_log={decode_log}",
    ])
    assert rc == 0

    clean_file(decode_log + "_pred")
    clean_file(decode_log + "_gt")
    buf = io.StringIO()
    result = score_files(
        decode_log + "_gt", decode_log + "_pred",
        char=True, verbose=True, stream=buf,
    )
    with open(os.path.join(workdir, "transfer_wer_report.txt"), "w") as f:
        f.write(buf.getvalue())

    # --- stage D: why it works — simulated vs real posterior similarity ---
    post = posterior_similarity(workdir, enc_cfg, enc_params, enc_tok, log)

    return {
        "metric": "tasu_transfer",
        "wer": result["wer"],
        "n_ref_tokens": result["all"],
        "encoder_dev_ter": round(ter, 4),
        "posterior": post,
        "ckpt": merged,
        "n_words": n_words, "noise_std": noise_std, "rate_var": rate_var,
        "confuse_words": confuse_words,
    }


def posterior_similarity(workdir, enc_cfg, enc_params, enc_tok, log=print):
    """JS / top-1 / edit metrics between the REAL encoder CTC posterior
    (PSD-collapsed, the stage-C projector input) and the SIMULATED
    pseudo-posterior (the stage-B projector input) on dev utterances —
    tools/posterior_analysis.py metrics, the reference's
    distribution_analysis.py methodology."""
    import functools

    import jax
    import jax.numpy as jnp

    from ps_slm_tpu.config import FbankConfig
    from ps_slm_tpu.models.tasu import encode_speech
    from ps_slm_tpu.ops import fbank as fb
    from ps_slm_tpu.ops.psd import psd
    from ps_slm_tpu.ops.pseudo_posterior import pseudo_posterior
    from ps_slm_tpu.tools.posterior_analysis import analyze_pair

    dev = _load_split(workdir, "dev")
    fcfg = FbankConfig()
    metrics = []
    enc_fn = jax.jit(
        functools.partial(encode_speech, use_flash=False),
        static_argnums=(1,),
    )
    for key, wav, target in dev:
        feats, flens = fb.frontend(
            jnp.asarray(wav[None]), jnp.asarray([len(wav)]), None,
            cfg=fcfg, train=False,
        )
        _, post, lens = enc_fn(
            {"encoder": enc_params}, enc_cfg, feats, flens
        )
        post_c, lens_c = psd(
            post, lens, post, blank_id=enc_cfg.blank_id,
        )
        real = np.asarray(post_c[0, : int(lens_c[0])], np.float64)
        ids = np.asarray([enc_tok.encode(target)], np.int32)
        sim, _ = pseudo_posterior(
            jnp.asarray(ids), jnp.asarray([ids.shape[1]]),
            vocab_size=enc_cfg.vocab_size,
        )
        metrics.append(analyze_pair(real, np.asarray(sim[0], np.float64)))
    agg = {
        k: round(float(np.mean([m[k] for m in metrics])), 4)
        for k in metrics[0]
    }
    log(f"stage D posterior similarity (dev mean): {agg}")
    return agg


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    workdir = "/tmp/ps_tasu_transfer"
    kw = {}
    if "--quick" in argv:
        kw = dict(n_train=192, enc_epochs=4, text_epochs=8, n_words=16,
                  noise_std=0.0, rate_var=0.0, frame_budget=400)
    for a in argv:
        if a.startswith("--workdir="):
            workdir = a.split("=", 1)[1]
        elif a.startswith("--enc-epochs="):
            kw["enc_epochs"] = int(a.split("=", 1)[1])
        elif a.startswith("--text-epochs="):
            kw["text_epochs"] = int(a.split("=", 1)[1])
        elif a.startswith("--n-words="):
            kw["n_words"] = int(a.split("=", 1)[1])
        elif a.startswith("--noise-std="):
            kw["noise_std"] = float(a.split("=", 1)[1])
        elif a.startswith("--stop-at-ter="):
            # de-flattered canary (VERDICT r4 weak #6): leave the encoder
            # imperfect so the sim-vs-real posterior gap is reference-like
            kw["stop_at_ter"] = float(a.split("=", 1)[1])
        elif a.startswith("--confuse-words="):
            # confident-but-wrong variant of the same knob (see
            # train_encoder docstring for why undertraining is the wrong
            # kind of imperfection)
            kw["confuse_words"] = int(a.split("=", 1)[1])
    if "--platform" in argv and "cpu" in argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    result = run(workdir, **kw)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
