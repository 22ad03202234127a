"""GPipe pipeline parallelism (parallel/pipeline.py) on the virtual mesh.

The reference has no pipeline parallelism (SURVEY.md §2.C); these tests pin
the beyond-parity ``pipe`` mesh axis: the pipelined decoder stack must be
numerically identical to the plain ``lax.scan`` stack — forward, gradients,
LoRA-dropout rng alignment, and a full sharded TASU train step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ps_slm_tpu.models import qwen2
from ps_slm_tpu.parallel import mesh as meshlib
from ps_slm_tpu.parallel.pipeline import microbatch_count

pytestmark = pytest.mark.slow  # compile-heavy mesh tests


def _llm(seed=0, layers=4, hidden=32):
    cfg = dataclasses.replace(
        qwen2.Qwen2Config.tiny(), num_hidden_layers=layers,
        hidden_size=hidden, intermediate_size=2 * hidden,
        num_attention_heads=4, num_key_value_heads=2, head_dim=hidden // 4,
    )
    params = qwen2.init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def _inputs(cfg, b=8, s=10, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, cfg.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), bool)
    mask[0, -3:] = False  # one padded row exercises the mask circulation
    return jnp.asarray(ids), jnp.asarray(mask)


def test_microbatch_count():
    assert microbatch_count(8, 0, 2) == 4      # default 2*stages
    assert microbatch_count(8, 3, 2) == 2      # largest divisor <= 3
    assert microbatch_count(8, 16, 2) == 8     # capped at batch
    assert microbatch_count(7, 4, 2) == 1      # prime batch -> 1
    assert microbatch_count(12, 6, 4) == 6


@pytest.mark.parametrize("pp,n_micro", [(2, 0), (4, 0), (4, 1), (2, 8)])
def test_pipeline_forward_matches_scan(pp, n_micro):
    cfg, params = _llm()
    mesh = meshlib.build_mesh({"pipe": pp, "data": 8 // pp})
    ids, mask = _inputs(cfg)
    x = qwen2.embed(params, ids)

    want, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False
    )
    got, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False,
        pipeline_mesh=mesh, pp_microbatches=n_micro,
    )
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), atol=1e-5, rtol=1e-5
    )


def test_pipeline_grads_match_scan():
    cfg, params = _llm()
    mesh = meshlib.build_mesh({"pipe": 4, "data": 2})
    ids, mask = _inputs(cfg)

    def loss(params, pipeline_mesh):
        x = qwen2.embed(params, ids)
        h, _ = qwen2.forward(
            params, cfg, x, attention_mask=mask, use_flash=False,
            pipeline_mesh=pipeline_mesh,
        )
        return (h.astype(jnp.float32) ** 2).mean()

    g_ref = jax.jit(jax.grad(loss), static_argnums=1)(params, None)
    g_pp = jax.grad(lambda p: loss(p, mesh))(params)
    ref_leaves, _ = jax.tree_util.tree_flatten(g_ref)
    pp_leaves, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b in zip(ref_leaves, pp_leaves):
        # fp32 roundoff floor: near-zero grads differ at ~1e-8 absolute
        scale = max(float(jnp.abs(a).max()), 1e-8)
        err = float(jnp.abs(a - b).max())
        assert err <= 1e-4 * scale + 1e-7, (err, scale)


def test_pipeline_remat_matches():
    cfg, params = _llm()
    mesh = meshlib.build_mesh({"pipe": 2, "data": 4})
    ids, mask = _inputs(cfg)
    x = qwen2.embed(params, ids)
    a, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False,
        pipeline_mesh=mesh,
    )
    b, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False,
        pipeline_mesh=mesh, remat=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipeline_lora_dropout():
    """LoRA dropout under the pipeline: deterministic in the rng, a real
    dropout (two rngs differ), and bit-aligned with the plain scan at M=1
    (microbatch == batch, where the Bernoulli shapes coincide — at M>1 the
    draws are per-microbatch: same distribution, different stream)."""
    from types import SimpleNamespace

    from ps_slm_tpu.models.lora import add_lora

    cfg, params = _llm()
    peft = SimpleNamespace(r=4, lora_alpha=8,
                           target_modules=["q_proj", "o_proj"])
    params = add_lora(params, peft, jax.random.PRNGKey(7))
    # non-zero B so the adapter path contributes
    for name in ("q_proj", "o_proj"):
        node = dict(params["layers"][name])
        node["lora_b"] = jnp.full_like(node["lora_b"], 0.02)
        params["layers"][name] = node

    mesh = meshlib.build_mesh({"pipe": 4, "data": 2})
    ids, mask = _inputs(cfg)
    x = qwen2.embed(params, ids)
    rng = jax.random.PRNGKey(11)

    def run(rng, n_micro, pipeline_mesh=mesh):
        h, _ = qwen2.forward(
            params, cfg, x, attention_mask=mask, use_flash=False,
            lora_dropout=0.3, lora_dropout_rng=rng,
            pipeline_mesh=pipeline_mesh, pp_microbatches=n_micro,
        )
        return np.asarray(h)

    a1, a2 = run(rng, 4), run(rng, 4)
    np.testing.assert_array_equal(a1, a2)           # rng-deterministic
    assert np.abs(a1 - run(jax.random.PRNGKey(12), 4)).max() > 1e-3

    want, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False,
        lora_dropout=0.3, lora_dropout_rng=rng,
    )
    np.testing.assert_allclose(                      # M=1: same draws
        np.asarray(want), run(rng, 1), atol=1e-5, rtol=1e-5
    )


def test_pipeline_qlora_int8_base():
    """QLoRA under the pipe mesh: int8 q8/scale leaves shard over pipe too
    (dim-0 chunks per stage), q8_matmul runs inside the shard_map stage, and
    the result matches the unpipelined QLoRA forward."""
    from types import SimpleNamespace

    from ps_slm_tpu.models.lora import add_lora
    from ps_slm_tpu.models.quantization import quantize_llm

    cfg, params = _llm()
    params = quantize_llm(params)
    peft = SimpleNamespace(r=4, lora_alpha=8, target_modules=["q_proj"])
    params = add_lora(params, peft, jax.random.PRNGKey(3))
    node = dict(params["layers"]["q_proj"])
    node["lora_b"] = jnp.full_like(node["lora_b"], 0.02)
    params["layers"]["q_proj"] = node

    mesh = meshlib.build_mesh({"pipe": 2, "data": 4})
    sh = meshlib.param_shardings(params, mesh, min_size=1)
    assert sh["layers"]["q_proj"]["q8"].spec[0] == "pipe"
    assert sh["layers"]["q_proj"]["scale"].spec[0] == "pipe"

    ids, mask = _inputs(cfg)
    x = qwen2.embed(params, ids)
    want, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False
    )
    got, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False,
        pipeline_mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), atol=1e-5, rtol=1e-5
    )


def test_pipeline_qlora_int4_base():
    """Same as the int8 case with the group-wise int4 scheme: q4/scale4
    leaves pipe-shard on dim 0 and the pipelined forward matches the
    unpipelined one."""
    from types import SimpleNamespace

    from ps_slm_tpu.models.lora import add_lora
    from ps_slm_tpu.models.quantization import quantize_llm

    cfg, params = _llm()
    params = quantize_llm(params, bits=4, group_size=16)
    peft = SimpleNamespace(r=4, lora_alpha=8, target_modules=["q_proj"])
    params = add_lora(params, peft, jax.random.PRNGKey(3))
    node = dict(params["layers"]["q_proj"])
    node["lora_b"] = jnp.full_like(node["lora_b"], 0.02)
    params["layers"]["q_proj"] = node

    mesh = meshlib.build_mesh({"pipe": 2, "data": 4})
    sh = meshlib.param_shardings(params, mesh, min_size=1)
    assert sh["layers"]["q_proj"]["q4"].spec[0] == "pipe"
    assert sh["layers"]["q_proj"]["scale4"].spec[0] == "pipe"

    ids, mask = _inputs(cfg)
    x = qwen2.embed(params, ids)
    want, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False
    )
    got, _ = qwen2.forward(
        params, cfg, x, attention_mask=mask, use_flash=False,
        pipeline_mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), atol=1e-5, rtol=1e-5
    )


def test_pipe_param_sharding_rule():
    """pipe>1 shards the LLM stacked layer axis (and only the LLM's: the
    q-former projector also has a 'layers' key)."""
    from ps_slm_tpu.config import ModelConfig, TrainConfig
    from ps_slm_tpu.models.tasu import model_factory

    tc = TrainConfig(ctc_posterior=True, gt_emb=True,
                     freeze_llm=True, freeze_encoder=True)
    mc = ModelConfig(
        llm_path="", encoder_path=None, encoder_projector="q-former",
        encoder_dim=16, llm_dim=64, qformer_layers=2, qformer_heads=4,
        query_len=4,
    )
    model = model_factory(tc, mc, rng=jax.random.PRNGKey(0))
    mesh = meshlib.build_mesh({"pipe": 2, "data": 4})
    sh = meshlib.param_shardings(model.params, mesh, min_size=256)
    assert sh["llm"]["layers"]["q_proj"]["kernel"].spec[0] == "pipe"
    for leaf in jax.tree_util.tree_leaves(
        sh["projector"], is_leaf=lambda x: hasattr(x, "spec")
    ):
        assert "pipe" not in str(leaf.spec)


def test_pipeline_tasu_train_step():
    """Full sharded TASU train step on a pipe x data x fsdp mesh: loss equals
    the plain data-parallel step (same rng), and training still descends."""
    from tests.test_parallel import _model_and_batch
    from ps_slm_tpu.models.tasu import forward, trainable_mask
    from ps_slm_tpu.training.step import make_train_step
    from ps_slm_tpu.training.train_state import (
        build_optimizer, create_train_state,
    )

    model, tc, batch = _model_and_batch()
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    loss_dp, _ = forward(model, model.params, jbatch, jax.random.PRNGKey(3))

    mesh = meshlib.build_mesh({"pipe": 2, "data": 2, "fsdp": 2})
    model.mesh = mesh
    model.pp_microbatches = 2
    model.params = meshlib.shard_params(model.params, mesh, 256)
    loss_pp, _ = forward(model, model.params, jbatch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(loss_dp), float(loss_pp), rtol=2e-5)

    trainable = trainable_mask(model, tc)
    tx, _ = build_optimizer(tc, trainable)
    state = create_train_state(model.params, tx, trainable)
    gbatch = meshlib.shard_batch(jbatch, mesh)
    step = make_train_step(model, tx, trainable)
    losses = []
    for _ in range(4):
        state, metrics = step(state, gbatch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
