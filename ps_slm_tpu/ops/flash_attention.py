"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the fused attention the reference gets from
``torch_npu.npu_fusion_attention`` / flash-attn
(``Multitask/utils/npu_flash_attn.py:28-52``) and HF SDPA.

Layout: q [B,S,Hq,D], k/v [B,T,Hkv,D] (GQA: Hq % Hkv == 0).  Padding is
expressed as a per-row valid window ``[kv_start, kv_end)`` — this covers both
right-padded training batches (start=0) and left-padded prefill (end=T) —
passed through scalar prefetch (SMEM).  Causality is a static flag.

Kernel structure (canonical TPU flash):
  forward  grid (B, Hq, S/Bq, T/Bk): online softmax with m/l/acc carried in
           VMEM scratch across the sequential kv-block grid dimension.
  dq       grid (B, Hq, S/Bq, T/Bk): dq accumulated in the out block, which is
           revisited across the kv dimension.
  dkv      grid (B, Hkv, n_rep, T/Bk, S/Bq): dk/dv out blocks revisited across
           (n_rep, q-block) dims, summing GQA head groups without races.

Fully-masked q rows produce zeros (guarded divide).  Softmax statistics are
kept in fp32; matmuls run on the MXU with fp32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# 512-blocks measured 3.4x faster than 128 at 4096 tokens (docs/PERF.md);
# the wrapper clamps blocks to the padded sequence length for short inputs.
DEFAULT_BQ = 512
DEFAULT_BK = 512


def _compiler_params(dimension_semantics):
    """Mark independent grid dims parallel so Mosaic pipelines them;
    without this the whole grid executes fully serialized."""
    try:
        return pltpu.CompilerParams(dimension_semantics=dimension_semantics)
    except TypeError:  # older field name
        return pltpu.CompilerParams()


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU test mesh)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def _fwd_kernel(
    kv_start_ref, kv_end_ref,  # scalar prefetch [B]
    q_ref, k_ref, v_ref,       # blocks
    o_ref, lse_ref,            # outputs
    acc_ref, m_ref, l_ref,     # scratch
    *, causal: bool, scale: float, bq: int, bk: int, t_pad: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_first = qi * bq
    k_first = ki * bk
    # prune kv blocks entirely outside the valid window (padding) and, for
    # causal attention, strictly above the diagonal — both static-shape safe
    should_run = (k_first < kv_end_ref[b]) & (k_first + bk > kv_start_ref[b])
    if causal:
        should_run &= k_first <= q_first + bq - 1

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)          # [bq, d]
        k = k_ref[0, 0].astype(jnp.float32)          # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                     # [bq, bk]

        kv_pos = k_first + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = (kv_pos >= kv_start_ref[b]) & (kv_pos < kv_end_ref[b])
        if causal:
            q_pos = q_first + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            mask &= kv_pos <= q_pos
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]                             # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                        # [bq, bk]
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)               # [bq, 1]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)           # [bk, d]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse = m_ref[:] + jnp.log(l_safe)
        lse = jnp.where(l == 0.0, NEG_INF, lse)
        lse_ref[0, 0] = lse.astype(jnp.float32)


def _dq_kernel(
    kv_start_ref, kv_end_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    acc_ref,
    *, causal: bool, scale: float, bq: int, bk: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_first = qi * bq
    k_first = ki * bk
    should_run = (k_first < kv_end_ref[b]) & (k_first + bk > kv_start_ref[b])
    if causal:
        should_run &= k_first <= q_first + bq - 1

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0].astype(jnp.float32)             # [bq,1]
        delta = delta_ref[0, 0].astype(jnp.float32)          # [bq,1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        kv_pos = k_first + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = (kv_pos >= kv_start_ref[b]) & (kv_pos < kv_end_ref[b])
        if causal:
            q_pos = q_first + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            mask &= kv_pos <= q_pos
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)          # [bq,bk]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [bq,bk]
        ds = p * (dp - delta)
        acc_ref[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(ki == n_k - 1)
    def _finalize():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(
    kv_start_ref, kv_end_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc_ref, dv_acc_ref,
    *, causal: bool, scale: float, bq: int, bk: int,
):
    # grid order (b, hkv, ki, rep, qi): all (rep, qi) accumulation steps for a
    # given kv block are consecutive, so dk/dv out blocks are revisited
    # contiguously (TPU sequential-grid accumulation requirement).
    b = pl.program_id(0)
    ki = pl.program_id(2)
    rep = pl.program_id(3)
    qi = pl.program_id(4)
    n_rep = pl.num_programs(3)
    n_q = pl.num_programs(4)

    @pl.when((rep == 0) & (qi == 0))
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    q_first = qi * bq
    k_first = ki * bk
    should_run = (k_first < kv_end_ref[b]) & (k_first + bk > kv_start_ref[b])
    if causal:
        should_run &= k_first <= q_first + bq - 1

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0].astype(jnp.float32)             # [bq,1]
        delta = delta_ref[0, 0].astype(jnp.float32)          # [bq,1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        kv_pos = k_first + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = (kv_pos >= kv_start_ref[b]) & (kv_pos < kv_end_ref[b])
        if causal:
            q_pos = q_first + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            mask &= kv_pos <= q_pos
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        # dv += P^T @ do
        dv_acc_ref[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        # dk += dS^T @ q * scale
        dk_acc_ref[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when((rep == n_rep - 1) & (qi == n_q - 1))
    def _finalize():
        dk_ref[0, 0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _window_from_mask(kv_mask, b, t):
    """[B,T] bool -> (start [B], end [B]) int32 valid windows."""
    if kv_mask is None:
        start = jnp.zeros((b,), jnp.int32)
        end = jnp.full((b,), t, jnp.int32)
    else:
        idx = jax.lax.broadcasted_iota(jnp.int32, kv_mask.shape, 1)
        any_valid = jnp.any(kv_mask, axis=1)
        start = jnp.where(
            any_valid, jnp.min(jnp.where(kv_mask, idx, t), axis=1), 0
        ).astype(jnp.int32)
        end = jnp.where(
            any_valid, jnp.max(jnp.where(kv_mask, idx + 1, 0), axis=1), 0
        ).astype(jnp.int32)
    return start, end


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _flash(q, k, v, kv_start, kv_end, causal, scale, bq, bk):
    out, _ = _flash_fwd_impl(q, k, v, kv_start, kv_end, causal, scale, bq, bk)
    return out


def _flash_fwd_impl(q, k, v, kv_start, kv_end, causal, scale, bq, bk):
    b, hq, s, d = q.shape
    _, hkv, t, _ = k.shape
    n_rep = hq // hkv
    grid = (b, hq, s // bq, t // bk)

    kernel = functools.partial(
        _fwd_kernel, causal=causal, scale=scale, bq=bq, bk=bk, t_pad=t
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j, *_: (b_, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, bk, d),
                    lambda b_, h, i, j, *_: (b_, h // n_rep, j, 0),
                ),
                pl.BlockSpec(
                    (1, 1, bk, d),
                    lambda b_, h, i, j, *_: (b_, h // n_rep, j, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j, *_: (b_, h, i, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b_, h, i, j, *_: (b_, h, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, s, 1), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel",) * 3 + ("arbitrary",)),
        interpret=_interpret(),
    )(kv_start, kv_end, q, k, v)
    return out, lse


def _flash_fwd(q, k, v, kv_start, kv_end, causal, scale, bq, bk):
    out, lse = _flash_fwd_impl(q, k, v, kv_start, kv_end, causal, scale, bq, bk)
    return out, (q, k, v, kv_start, kv_end, out, lse)


def _flash_bwd(causal, scale, bq, bk, res, dout):
    q, k, v, kv_start, kv_end, out, lse = res
    b, hq, s, d = q.shape
    _, hkv, t, _ = k.shape
    n_rep = hq // hkv

    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # [B,Hq,S,1]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, causal=causal, scale=scale, bq=bq, bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hq, s // bq, t // bk),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j, *_: (b_, h, i, 0)),
                pl.BlockSpec((1, 1, bk, d), lambda b_, h, i, j, *_: (b_, h // n_rep, j, 0)),
                pl.BlockSpec((1, 1, bk, d), lambda b_, h, i, j, *_: (b_, h // n_rep, j, 0)),
                pl.BlockSpec((1, 1, bq, d), lambda b_, h, i, j, *_: (b_, h, i, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b_, h, i, j, *_: (b_, h, i, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b_, h, i, j, *_: (b_, h, i, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d), lambda b_, h, i, j, *_: (b_, h, i, 0)
            ),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
        compiler_params=_compiler_params(("parallel",) * 3 + ("arbitrary",)),
        interpret=_interpret(),
    )(kv_start, kv_end, q, k, v, dout, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, causal=causal, scale=scale, bq=bq, bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv, t // bk, n_rep, s // bq),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq, d),
                    lambda b_, hk, j, r, i, *_: (b_, hk * n_rep + r, i, 0),
                ),
                pl.BlockSpec((1, 1, bk, d), lambda b_, hk, j, r, i, *_: (b_, hk, j, 0)),
                pl.BlockSpec((1, 1, bk, d), lambda b_, hk, j, r, i, *_: (b_, hk, j, 0)),
                pl.BlockSpec(
                    (1, 1, bq, d),
                    lambda b_, hk, j, r, i, *_: (b_, hk * n_rep + r, i, 0),
                ),
                pl.BlockSpec(
                    (1, 1, bq, 1),
                    lambda b_, hk, j, r, i, *_: (b_, hk * n_rep + r, i, 0),
                ),
                pl.BlockSpec(
                    (1, 1, bq, 1),
                    lambda b_, hk, j, r, i, *_: (b_, hk * n_rep + r, i, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bk, d), lambda b_, hk, j, r, i, *_: (b_, hk, j, 0)),
                pl.BlockSpec((1, 1, bk, d), lambda b_, hk, j, r, i, *_: (b_, hk, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, t, d), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, t, d), v.dtype),
        ],
        compiler_params=_compiler_params(
            ("parallel",) * 3 + ("arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(kv_start, kv_end, q, k, v, dout, lse, delta)

    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
) -> jnp.ndarray:
    """Flash attention wrapper taking the public [B,S,H,D] layout.

    Pads S/T up to block multiples, converts the padding mask into
    per-row [start, end) windows, and slices the result back.
    """
    b, s, hq, d = q.shape
    t = k.shape[1]
    scale = scale if scale is not None else d ** -0.5
    # clamp blocks: no bigger than the 128-padded sequence
    block_q = min(block_q, max(-(-s // 128) * 128, 128))
    block_k = min(block_k, max(-(-t // 128) * 128, 128))

    kv_start, kv_end = _window_from_mask(kv_mask, b, t)

    qt = _pad_to(jnp.swapaxes(q, 1, 2), 2, block_q)
    kt = _pad_to(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_to(jnp.swapaxes(v, 1, 2), 2, block_k)

    out = _flash(qt, kt, vt, kv_start, kv_end, causal, scale, block_q, block_k)
    return jnp.swapaxes(out[:, :, :s, :], 1, 2)
