"""Fused LayerNorm / RMSNorm Pallas kernels (fp32 statistics, bf16 I/O).

The reference's fp32-LayerNorm policy (SenseVoice.py:270-282, ps-slm.py:
223-235) costs multiple HBM passes when expressed as jnp casts: XLA
materializes fp32 intermediates around the bf16 tensors.  These kernels read
the row once, compute statistics in fp32 on-chip, and write once — measured
~5x less norm time across the 140-norm encoder stack (docs/PERF.md).

Backward is a custom VJP: dx in one fused kernel; dweight/dbias as
per-block partial sums reduced outside (keeps the kernel race-free on the
sequential TPU grid).

Only used on TPU with lane-aligned feature dims; the jnp reference path
(models/layers.py, models/qwen2.py) remains the fallback and the test
oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def _cp(dims):
    try:
        return pltpu.CompilerParams(dimension_semantics=dims)
    except TypeError:  # pragma: no cover
        return pltpu.CompilerParams()


# ----------------------------------------------------------------------------
# forward kernels
# ----------------------------------------------------------------------------

def _ln_fwd_kernel(x_ref, w_ref, b_ref, o_ref, mu_ref, rs_ref, *, eps, d):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * w_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)
    mu_ref[:] = mu
    rs_ref[:] = rstd


def _rms_fwd_kernel(x_ref, w_ref, o_ref, rs_ref, *, eps, d):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    o_ref[:] = (x * rstd * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    rs_ref[:] = rstd


# ----------------------------------------------------------------------------
# backward kernels
# ----------------------------------------------------------------------------

def _ln_bwd_kernel(
    x_ref, w_ref, mu_ref, rs_ref, g_ref,
    dx_ref, dw_ref, db_ref, *, d,
):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    xhat = (x - mu_ref[:]) * rs_ref[:]
    gw = g * w
    m1 = jnp.mean(gw, axis=-1, keepdims=True)
    m2 = jnp.mean(gw * xhat, axis=-1, keepdims=True)
    dx = (gw - m1 - xhat * m2) * rs_ref[:]
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # partial sums live in row 0 of an 8-row block (TPU min sublane tile)
    row0 = (
        jax.lax.broadcasted_iota(jnp.int32, (8, d), 0) == 0
    ).astype(jnp.float32)
    dw_ref[:] = row0 * jnp.sum(g * xhat, axis=0, keepdims=True)
    db_ref[:] = row0 * jnp.sum(g, axis=0, keepdims=True)


def _rms_bwd_kernel(
    x_ref, w_ref, rs_ref, g_ref, dx_ref, dw_ref, *, d,
):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    xhat = x * rs_ref[:]
    gw = g * w
    m = jnp.mean(gw * xhat, axis=-1, keepdims=True)
    dx = (gw - xhat * m) * rs_ref[:]
    dx_ref[:] = dx.astype(dx_ref.dtype)
    row0 = (
        jax.lax.broadcasted_iota(jnp.int32, (8, d), 0) == 0
    ).astype(jnp.float32)
    dw_ref[:] = row0 * jnp.sum(g * xhat, axis=0, keepdims=True)


# ----------------------------------------------------------------------------
# wrappers (rows flattened, padded to BLOCK_ROWS)
# ----------------------------------------------------------------------------

def _flatten_pad(x):
    d = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    pad = (-rows) % BLOCK_ROWS
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2, rows, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, weight, bias, eps: float = 1e-5):
    y, _, _ = _ln_fwd(x, weight, bias, eps)
    return y


def _ln_fwd(x, weight, bias, eps):
    d = x.shape[-1]
    x2, rows, pad = _flatten_pad(x)
    n = x2.shape[0]
    grid = (n // BLOCK_ROWS,)
    y, mu, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        compiler_params=_cp(("parallel",)),
        interpret=_interpret(),
    )(x2, weight.reshape(1, d), bias.reshape(1, d))
    return y[:rows].reshape(x.shape), mu, rstd


def _ln_vjp_fwd(x, weight, bias, eps):
    y, mu, rstd = _ln_fwd(x, weight, bias, eps)
    return y, (x, weight, mu, rstd)


def _ln_vjp_bwd(eps, res, g):
    x, weight, mu, rstd = res
    d = x.shape[-1]
    x2, rows, pad = _flatten_pad(x)
    g2, _, _ = _flatten_pad(g)
    n = x2.shape[0]
    nb = n // BLOCK_ROWS
    dx, dw_part, db_part = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, d=d),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((nb * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((nb * 8, d), jnp.float32),
        ],
        compiler_params=_cp(("parallel",)),
        interpret=_interpret(),
    )(x2, weight.reshape(1, d), mu, rstd, g2)
    dx = dx[:rows].reshape(x.shape)
    dw = jnp.sum(dw_part, axis=0).astype(weight.dtype)
    db = jnp.sum(db_part, axis=0).astype(weight.dtype)
    return dx, dw, db


fused_layer_norm.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_rms_norm(x, weight, eps: float = 1e-6):
    y, _ = _rms_fwd(x, weight, eps)
    return y


def _rms_fwd(x, weight, eps):
    d = x.shape[-1]
    x2, rows, pad = _flatten_pad(x)
    n = x2.shape[0]
    y, rstd = pl.pallas_call(
        functools.partial(_rms_fwd_kernel, eps=eps, d=d),
        grid=(n // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        compiler_params=_cp(("parallel",)),
        interpret=_interpret(),
    )(x2, weight.reshape(1, d))
    return y[:rows].reshape(x.shape), rstd


def _rms_vjp_fwd(x, weight, eps):
    y, rstd = _rms_fwd(x, weight, eps)
    return y, (x, weight, rstd)


def _rms_vjp_bwd(eps, res, g):
    x, weight, rstd = res
    d = x.shape[-1]
    x2, rows, pad = _flatten_pad(x)
    g2, _, _ = _flatten_pad(g)
    n = x2.shape[0]
    nb = n // BLOCK_ROWS
    dx, dw_part = pl.pallas_call(
        functools.partial(_rms_bwd_kernel, d=d),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((nb * 8, d), jnp.float32),
        ],
        compiler_params=_cp(("parallel",)),
        interpret=_interpret(),
    )(x2, weight.reshape(1, d), rstd, g2)
    dx = dx[:rows].reshape(x.shape)
    dw = jnp.sum(dw_part, axis=0).astype(weight.dtype)
    return dx, dw


fused_rms_norm.defvjp(_rms_vjp_fwd, _rms_vjp_bwd)


def norms_eligible(d: int) -> bool:
    """Fused-norm auto-dispatch gate.

    Measured END-TO-END the Pallas norms are ~5% slower than the jnp path
    (924 -> 874 audio-sec/s/chip): the pallas_call boundary blocks XLA from
    fusing the norm into neighboring producers/consumers, costing more than
    the saved fp32 materialization.  Kept as opt-in (PS_FUSED_NORMS=1) for
    shapes/workloads where the fusion trade-off flips; default off.
    """
    import os

    if os.environ.get("PS_FUSED_NORMS") != "1":
        return False
    if d % 128 != 0:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ----------------------------------------------------------------------------
# jnp RMSNorm with a residual-thin custom VJP (the default LLM path)
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm_ref(x, weight, eps: float = 1e-6):
    """RMSNorm with fp32 statistics (HF Qwen2RMSNorm semantics), plain jnp
    ops so XLA fuses it into neighbours — but with a custom VJP that
    stashes only (x in its ORIGINAL dtype, rstd fp32) instead of the fp32
    upcast JAX AD keeps.

    At the flagship bench shape the AD residual is f32[28,5,543,1536]
    (467 MB/step written in forward, read back in backward — profiled in
    benchmarks/mfu_floor.py); x is bf16 *before* the upcast, so stashing it
    loses nothing: the backward recomputes the normalization from the same
    values and the gradients are mathematically identical to autodiff.
    """
    out, _ = _rms_ref_fwd(x, weight, eps)
    return out


def _rms_ref_fwd(x, weight, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    out = (x32 * rstd * weight.astype(jnp.float32)).astype(x.dtype)
    return out, (x, weight, rstd)


def _rms_ref_bwd(eps, res, g):
    x, weight, rstd = res
    x32 = x.astype(jnp.float32)
    xn = x32 * rstd
    g32 = g.astype(jnp.float32)
    dxn = g32 * weight.astype(jnp.float32)
    dw = jnp.sum(
        (g32 * xn).reshape(-1, x.shape[-1]), axis=0
    ).astype(weight.dtype)
    dx = rstd * (
        dxn - xn * jnp.mean(dxn * xn, axis=-1, keepdims=True)
    )
    return dx.astype(x.dtype), dw


rms_norm_ref.defvjp(_rms_ref_fwd, _rms_ref_bwd)
