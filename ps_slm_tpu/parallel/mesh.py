"""Device mesh + sharding rules — the ZeRO-2/FSDP equivalent.

The reference scales with DeepSpeed ZeRO-2 data parallelism over NCCL
(``conf/ds_config.json:15-21``, ``deepspeed_utils.py:516-519``).  The
TPU-native design (SURVEY.md §2.C): one ``jax.sharding.Mesh`` with axes

  pipe   optional GPipe pipeline axis (outermost, DCN-friendly): shards the
         stacked LLM layer axis; schedule in parallel/pipeline.py
  data   pure data parallelism (params replicated)
  fsdp   param/optimizer-state sharding axis — batch is also split here,
         so (data×fsdp) together form the global batch axis, while large
         params/optimizer state are sharded over fsdp (ZeRO-3 ⊃ ZeRO-2)
  tensor optional megatron-style axis for headroom (off by default; the
         1.5B flagship doesn't need it — SURVEY.md §2.C)

XLA GSPMD inserts all collectives (all-gather of fsdp-sharded params,
reduce-scatter/all-reduce of grads) from sharding annotations alone — there
is no user-level NCCL analogue to port.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

BATCH_AXES = ("data", "fsdp")


def build_mesh(
    mesh_shape: Optional[dict] = None, devices=None
) -> Mesh:
    """Build a Mesh. Default: all devices on the data axis.

    mesh_shape e.g. {"data": 2, "fsdp": 4} (product must equal #devices).
    Axis order fixed (data, fsdp, tensor) so ICI-adjacent devices land on the
    innermost (fsdp/tensor) axes where collectives are densest.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not mesh_shape:
        mesh_shape = {"data": n}
    shape = {"pipe": 1, "data": 1, "fsdp": 1, "tensor": 1}
    shape.update(mesh_shape)
    total = shape["pipe"] * shape["data"] * shape["fsdp"] * shape["tensor"]
    if total != n:
        raise ValueError(f"mesh {shape} needs {total} devices, have {n}")
    arr = np.asarray(devices).reshape(
        shape["pipe"], shape["data"], shape["fsdp"], shape["tensor"]
    )
    return Mesh(arr, ("pipe", "data", "fsdp", "tensor"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global batch is split over data×fsdp jointly."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style tensor-parallel rules for transformer projections:
# column-parallel (out-features sharded) for q/k/v/gate/up + embeddings,
# row-parallel (in-features sharded) for o/down. XLA inserts the
# all-reduces from these annotations alone.
_TP_COL = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "qkv", "w1",
           "ffn1"}
_TP_ROW = {"o_proj", "down_proj", "out", "w2", "ffn2"}


def _tp_spec(path_keys, shape, tensor_size: int):
    """Return (dim, axis) tensor-parallel placement or None."""
    names = {str(k) for k in path_keys}
    if "embed_tokens" in names:
        dim = 0                                     # vocab rows
    elif "lm_head" in names:
        dim = len(shape) - 1                        # vocab cols
    elif "kernel" in names and names & _TP_COL:
        dim = len(shape) - 1                        # out features
    elif "kernel" in names and names & _TP_ROW:
        dim = len(shape) - 2                        # in features
    else:
        return None
    if dim >= 0 and shape[dim] % tensor_size == 0:
        return dim, "tensor"
    return None


def _param_spec(
    path_keys, shape, fsdp_size: int, min_size: int, tensor_size: int = 1,
    pipe_size: int = 1,
) -> P:
    """Sharding rule: optional pipeline placement of the stacked LLM layer
    axis, then tensor-parallel placement, then FSDP on the largest remaining
    dimension divisible by fsdp_size for leaves with >= min_size elements;
    replicate the rest.

    Without a pipe axis, stacked-layer leaves (leading axis = layer) never
    shard the layer axis (scan carries it); with pipe > 1 the layer axis is
    sharded over ``pipe`` so each stage holds its L/P chunk resident —
    matching parallel/pipeline.py's shard_map in_specs, so no resharding
    happens at the pipeline boundary.
    """
    names = {str(k) for k in path_keys}
    # LLM decoder stack only (the q-former projector also has a "layers"
    # key, and the encoder has its own stacks — those are not pipelined)
    llm_stacked = (
        "layers" in names and not (names & {"projector", "encoder"})
    )
    spec = [None] * len(shape)
    if (
        pipe_size > 1 and llm_stacked and len(shape) > 1
        and shape[0] % pipe_size == 0
    ):
        spec[0] = "pipe"
    if tensor_size > 1 and int(np.prod(shape)) >= min_size:
        tp = _tp_spec(path_keys, shape, tensor_size)
        if tp is not None and spec[tp[0]] is None:
            spec[tp[0]] = tp[1]
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P(*spec)
    if "fsmn" in {str(k) for k in path_keys}:
        # depthwise-conv kernels: fsdp would land on the channel dim (the
        # only one divisible), and a channel-sharded depthwise conv drags
        # the batch-sharded activations into a channel-sharded layout that
        # GSPMD can only reach via involuntary full rematerialization on
        # data>1 meshes.  The kernels are tiny (k x 1 x size); replicate.
        return P(*spec)
    stacked = any(str(k) == "layers" for k in path_keys)
    start = 1 if (stacked and len(shape) > 1) else 0
    best, best_size = None, 0
    for i in range(start, len(shape)):
        if spec[i] is None and shape[i] % fsdp_size == 0 and shape[i] > best_size:
            best, best_size = i, shape[i]
    if best is not None:
        spec[best] = "fsdp"
    return P(*spec)


def param_shardings(
    params: Params, mesh: Mesh, min_size: int = 2 ** 16
) -> Params:
    """Pytree of NamedShardings implementing the TP + FSDP rules."""
    fsdp_size = mesh.shape["fsdp"]
    tensor_size = mesh.shape.get("tensor", 1)
    pipe_size = mesh.shape.get("pipe", 1)

    def one(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        spec = _param_spec(
            keys, jnp.shape(leaf), fsdp_size, min_size, tensor_size,
            pipe_size,
        )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Params, mesh: Mesh, min_size: int = 2 ** 16) -> Params:
    shardings = param_shardings(params, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Place a batch with the batch axis split over data×fsdp.

    Single process: ``batch`` is the global batch, placed directly.
    Multi process (``jax.distributed``): ``batch`` is this host's shard (the
    ``GlobalBatcher`` host slice) and the global array is assembled from the
    per-process chunks — the TPU-native replacement for the reference's
    per-rank DataLoader + NCCL world (``deepspeed_utils.py:154-178``).

    With a ``pipe`` axis spanning processes the batch is pipe-REPLICATED:
    a process whose devices cover every data shard must pass the FULL
    global batch (its GlobalBatcher group is its position along the batch
    axes, not its raw process id) — tests/multihost_runner.py shows both
    feeds.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def pad_batch_to_multiple(batch: Dict[str, np.ndarray], mult: int):
    """Pad the leading batch dim to a multiple of the mesh batch size by
    repeating row 0 with a zeroed loss contribution.

    Deterministic global batching (SURVEY.md §2.C): every host computes the
    same padded size, so no join barrier (deepspeed_utils.py:102-123) is ever
    needed.  Padded rows are marked by `batch_valid` (used to zero their loss).
    """
    b = next(iter(batch.values())).shape[0]
    pad = (-b) % mult
    out = {}
    for k, v in batch.items():
        if pad:
            v = np.concatenate([v, np.repeat(v[:1], pad, axis=0)], axis=0)
        out[k] = v
    valid = np.ones((b + pad,), bool)
    if pad:
        valid[-pad:] = False
    out["batch_valid"] = valid
    return out
