"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Exercises the real pjit/GSPMD path (data / data×fsdp meshes), FSDP param
sharding, and one full sharded train step — the capability gap the reference
could only test on a live cluster (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.config import ModelConfig, TrainConfig
from ps_slm_tpu.models.tasu import model_factory, trainable_mask
from ps_slm_tpu.parallel import mesh as meshlib
from ps_slm_tpu.training.step import make_train_step
from ps_slm_tpu.training.train_state import build_optimizer, create_train_state

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 9)

SPEECH = 250


def _model_and_batch(rng_seed=0, b=8):
    tc = TrainConfig(
        ctc_posterior=True, gt_emb=True, gt_emb_noise=True,
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

    rng = np.random.default_rng(rng_seed)
    s = 12
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 3] = SPEECH
    mask = np.ones((b, s), bool)
    labels = ids.copy()
    labels[:, :5] = -100
    gt = rng.integers(1, 11, size=(b, 6)).astype(np.int32)
    batch = {
        "input_ids": ids, "attention_mask": mask, "labels": labels,
        "gt_ids": gt, "gt_lens": np.full((b,), 6, np.int32),
    }
    return model, tc, batch


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = meshlib.build_mesh(None)
    assert m.shape["data"] == 8
    m2 = meshlib.build_mesh({"data": 2, "fsdp": 4})
    assert m2.shape == {"pipe": 1, "data": 2, "fsdp": 4, "tensor": 1}
    with pytest.raises(ValueError):
        meshlib.build_mesh({"data": 3})


def test_fsdp_param_sharding_rule():
    model, _, _ = _model_and_batch()
    m = meshlib.build_mesh({"data": 2, "fsdp": 4})
    sharded = meshlib.shard_params(model.params, m, min_size=1024)
    # embed_tokens [256, 64]: 256 % 4 == 0 -> sharded over fsdp on dim 0
    emb_sh = sharded["llm"]["embed_tokens"].sharding
    assert "fsdp" in str(emb_sh.spec)
    # stacked layer leaves: layer axis never sharded
    qk = sharded["llm"]["layers"]["q_proj"]["kernel"]
    assert qk.sharding.spec[0] is None


@pytest.mark.parametrize("mesh_shape", [None, {"data": 2, "fsdp": 4}])
def test_sharded_train_step(mesh_shape):
    model, tc, batch = _model_and_batch()
    m = meshlib.build_mesh(mesh_shape)
    model.params = meshlib.shard_params(model.params, m, min_size=1024)
    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)
    gbatch = meshlib.shard_batch(
        {k: jnp.asarray(v) for k, v in batch.items()}, m
    )
    step = make_train_step(model, tx, trainable)
    losses = []
    for i in range(4):
        state, metrics = step(state, gbatch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_padded_global_batching_no_contribution():
    """Deterministic global batching: padded rows change nothing."""
    model, tc, batch5 = _model_and_batch(b=5)
    m = meshlib.build_mesh(None)
    padded = meshlib.pad_batch_to_multiple(batch5, 8)
    assert padded["input_ids"].shape[0] == 8

    from ps_slm_tpu.models.tasu import forward

    loss5, _ = forward(
        model, model.params,
        {k: jnp.asarray(v) for k, v in batch5.items()},
        jax.random.PRNGKey(3),
    )
    # disable stochastic noise differences: same rng, padded batch
    loss8, _ = forward(
        model, model.params,
        {k: jnp.asarray(v) for k, v in padded.items()},
        jax.random.PRNGKey(3),
    )
    # rows are identical except repeats of row 0 which are masked out; the
    # per-token mean over valid rows must match exactly up to noise rng
    # (gt_emb_noise draws per-batch-shape, so compare with noise off)
    tc2 = TrainConfig(**{**tc.__dict__, "gt_emb_noise": False})
    from ps_slm_tpu.models.tasu import TasuFlags
    model.flags = TasuFlags.from_train_config(tc2)
    loss5b, _ = forward(
        model, model.params,
        {k: jnp.asarray(v) for k, v in batch5.items()},
        jax.random.PRNGKey(3),
    )
    loss8b, _ = forward(
        model, model.params,
        {k: jnp.asarray(v) for k, v in padded.items()},
        jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(float(loss5b), float(loss8b), rtol=1e-5)


@pytest.mark.parametrize("num_hosts", [2, 4])
def test_multihost_global_batching_equals_single_host(tmp_path, num_hosts):
    """Every host sees the same step count, the union of host rows is the
    single-host stream, and the token-weighted loss over hosts equals the
    single-host loss per bucket (replaces the reference's gloo join barrier,
    deepspeed_utils.py:102-123)."""
    import json

    from ps_slm_tpu.config import DataConfig
    from ps_slm_tpu.data.dataset import get_speech_dataset
    from ps_slm_tpu.data.tokenizer import StubTokenizer
    from ps_slm_tpu.models.tasu import forward

    # text-only fixtures: manifest with no audio (load_audio=False)
    split = tmp_path / "train"
    split.mkdir()
    rng = np.random.default_rng(0)
    with open(split / "multitask.jsonl", "w") as f:
        for i in range(11):  # odd count -> uneven shards
            words = " ".join(
                f"w{rng.integers(100)}" for _ in range(rng.integers(2, 9))
            )
            f.write(json.dumps({
                "key": f"u{i}", "path": "", "target": words, "GT": words,
                "task": "ASR",
            }) + "\n")
    prompt = tmp_path / "multiprompt.jsonl"
    prompt.write_text(
        json.dumps({"task": "ASR", "prompt": "transcribe:"}) + "\n"
    )
    dc = DataConfig(
        multitask_prompt_path=str(prompt), train_scp_file_path=str(split),
        train_max_frame_length=120, ds_rate=1, token_bucket=8,
    )

    class GtTok:
        vocab_size = 11

        def encode(self, text):
            return [1 + (hash(w) % 10) for w in text.split()]

    tok = StubTokenizer()

    def batches(num_hosts, host_id):
        return list(get_speech_dataset(
            dc, tok, "train", encoder_tokenizer=GtTok(),
            num_hosts=num_hosts, host_id=host_id, load_audio=False,
        ))

    single = batches(1, 0)
    per_host = [batches(num_hosts, h) for h in range(num_hosts)]
    # identical step counts on every host — no join barrier needed
    assert all(len(b) == len(single) for b in per_host)
    # union of valid keys per bucket == single-host bucket keys
    for i, sb in enumerate(single):
        got = []
        for h in range(num_hosts):
            hb = per_host[h][i]
            got += [
                k for k, v in zip(hb["keys"], hb["batch_valid"]) if v
            ]
        assert sorted(got) == sorted(sb["keys"])

    # token-weighted loss over hosts == single-host loss per bucket
    # (noise off: the per-utterance draws depend on the padded batch shape)
    import dataclasses

    model, tc, _ = _model_and_batch()
    model.flags = dataclasses.replace(model.flags, gt_emb_noise=False)
    model.speech_token_id = tok.speech_token_id

    def loss_ntok(batch):
        jb = {
            k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }
        loss, m = forward(model, model.params, jb, None)
        return float(loss), float(m["ntokens"])

    for i, sb in enumerate(single):
        l1, n1 = loss_ntok(sb)
        tot = wsum = 0.0
        for h in range(num_hosts):
            lh, nh = loss_ntok(per_host[h][i])
            wsum += lh * nh
            tot += nh
        assert tot == n1
        np.testing.assert_allclose(wsum / tot, l1, rtol=2e-5)


def test_no_involuntary_remat_on_tp_mesh(capfd):
    """The dp x fsdp x tp training step must compile without GSPMD falling
    back to involuntary full rematerialization in the merge/scatter path
    (spmd_partitioner.cc warning).  Runs the exact driver dryrun config."""
    import __graft_entry__ as ge

    ge._dryrun_multichip_impl(8)
    err = capfd.readouterr().err
    assert "rematerialization" not in err, err


def test_tensor_parallel_sharding_and_step():
    """dp x fsdp x tp mesh: TP rules place q/k/v col-parallel and o row-
    parallel; one train step runs and matches the data-parallel loss."""
    model, tc, batch = _model_and_batch()
    m_dp = meshlib.build_mesh(None)
    m_tp = meshlib.build_mesh({"data": 2, "fsdp": 2, "tensor": 2})

    sh = meshlib.param_shardings(model.params, m_tp, min_size=256)
    qspec = sh["llm"]["layers"]["q_proj"]["kernel"].spec
    ospec = sh["llm"]["layers"]["o_proj"]["kernel"].spec
    assert qspec[-1] == "tensor"        # column parallel
    assert ospec[-2] == "tensor"        # row parallel

    from ps_slm_tpu.models.tasu import forward

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    loss_dp, _ = forward(
        model, meshlib.shard_params(model.params, m_dp, 256), jbatch,
        jax.random.PRNGKey(3),
    )
    loss_tp, _ = forward(
        model, meshlib.shard_params(model.params, m_tp, 256), jbatch,
        jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(float(loss_dp), float(loss_tp), rtol=2e-5)


def test_gradient_accumulation_equals_full_batch():
    """k=2 accumulation over two half batches == one full-batch step
    (ds_config.json gradient_accumulation_steps semantics)."""
    import dataclasses

    tc = TrainConfig(
        ctc_posterior=True, gt_emb=True, gt_emb_noise=False,
        freeze_llm=True, freeze_encoder=True, lr=1e-3,
        warmup_steps=1, total_steps=100,
    )
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="linear-silu",
        encoder_dim=11, llm_dim=64, encoder_projector_ds_rate=1,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    model.speech_token_id = SPEECH
    model.use_flash = False

    rng = np.random.default_rng(3)
    b, s = 4, 12
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    ids[:, 3] = SPEECH
    labels = ids.copy()
    labels[:, :5] = -100
    gt = rng.integers(1, 11, size=(b, 6)).astype(np.int32)
    full = {
        "input_ids": ids, "attention_mask": np.ones((b, s), bool),
        "labels": labels, "gt_ids": gt,
        "gt_lens": np.full((b,), 6, np.int32),
    }
    halves = [
        {k: v[i: i + 2] for k, v in full.items()} for i in (0, 2)
    ]

    trainable = trainable_mask(model, tc)
    key = jax.random.PRNGKey(0)

    def fresh_params():  # train steps donate their state; copy per run
        return jax.tree_util.tree_map(jnp.array, model.params)

    tx1, _ = build_optimizer(tc, trainable)
    s1 = create_train_state(fresh_params(), tx1, trainable)
    step1 = make_train_step(model, tx1, trainable)
    s1, _ = step1(s1, {k: jnp.asarray(v) for k, v in full.items()}, key)

    tc2 = dataclasses.replace(tc, gradient_accumulation_steps=2)
    tx2, _ = build_optimizer(tc2, trainable)
    s2 = create_train_state(fresh_params(), tx2, trainable)
    step2 = make_train_step(model, tx2, trainable)
    for h in halves:
        s2, _ = step2(s2, {k: jnp.asarray(v) for k, v in h.items()}, key)

    p1 = jax.tree_util.tree_leaves(s1.params["projector"])
    p2 = jax.tree_util.tree_leaves(s2.params["projector"])
    for a, b_ in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-6,
        )
