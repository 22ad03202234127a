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
    assert m2.shape == {"data": 2, "fsdp": 4, "tensor": 1}
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
