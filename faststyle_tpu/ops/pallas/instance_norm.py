"""Pallas TPU kernels: fused instance normalization (+relu +tail-mask).

Instance norm needs global (H, W) moments before any output element can be
written, so the HBM-traffic floor is 3 passes: one read for the moments, one
read + one write for the application. The round-1 profile of the packed
transform net (docs/PERF.md) showed the lax implementation paying ~10x that
floor — XLA materialized the float32 upcast of every activation
(`convert_element_type` was 2.6 ms/frame at 1080p, more than the convs) and
ran relu and the ragged tail re-zeroing as separate full passes.

These kernels hit the floor:
  stats pass   one read of x (any dtype), f32 sum and sum-of-squares per
               packed channel accumulated in VMEM across grid steps;
  apply pass   one read + one write: y = tailmask * relu(a * x + b) with the
               per-channel affine a = scale*rstd, b = shift - mean*a folded
               ahead of the kernel, relu and the ragged-tail mask fused into
               the single elementwise pass.

The activation is viewed as [N, M, CC] with M = HP*WP (a free reshape of the
packed NHWC layout); partial last tiles are masked in-kernel — no padding
copies (the round-1 kernel's jnp.pad of the full tensor is what made it lose
to XLA, 1.95 vs 1.38 ms).

Variance uses the one-pass E[x^2] - mu^2 form clamped at 0 (the clamp
guards the catastrophic-cancellation NaN the two-pass lax oracle avoids by
construction; with f32 accumulation the residual error is ~1e-7 * E[x^2],
orders below the 1e-3 eps). The lax implementations in ops.layers /
ops.packed remain the numerical oracles; tests run these kernels in
interpret mode against them on CPU and natively on TPU.

Counterpart of the reference's `tf.contrib.layers.instance_norm` use
(/root/reference/im_transf_net.py:226-247); the fusion itself has no
reference counterpart (TF1 ran it as a stock op graph).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_rows(m: int, cc: int, itemsize: int) -> int:
    """Rows per grid step: ~2 MB of VMEM per input block, sublane-aligned."""
    tm = max(32, (2 * 1024 * 1024) // max(1, cc * itemsize))
    return min(_round_up(m, 32), _round_up(tm, 32))


def _stats_kernel(x_ref, out_ref, *, m: int, tm: int):
    """Accumulate [sum, sumsq] per channel over row tiles of x.[N, M, CC]."""
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # [TM, CC]
    if m % tm:
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + j * tm
        x = jnp.where(rows < m, x, 0.0)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0, 0, :] += jnp.sum(x, axis=0)
    out_ref[0, 1, :] += jnp.sum(x * x, axis=0)


def _apply_kernel(
    x_ref,
    a_ref,
    b_ref,
    mh_ref,
    mw_ref,
    out_ref,
    *,
    tm: int,
    wp: int,
    hp: int,
    relu: bool,
    mask_h: bool,
    mask_w: bool,
):
    """y = tailmask * maybe_relu(a * x + b), one read + one write."""
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    y = x * a_ref[0] + b_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    if mask_h or mask_w:
        rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + j * tm
        if mask_h:  # garbage sub-rows live in the last packed row block
            in_tail = (rows >= (hp - 1) * wp).astype(jnp.float32)
            y = y * (1.0 - in_tail * (1.0 - mh_ref[0]))
        if mask_w:  # ... and in the last packed col block of every row
            in_tail = (rows % wp == wp - 1).astype(jnp.float32)
            y = y * (1.0 - in_tail * (1.0 - mw_ref[0]))
    out_ref[0] = y.astype(out_ref.dtype)


def packed_channel_tail_masks(
    p: int, c: int, hp: int, wp: int, valid_hw: Optional[Tuple[int, int]]
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """{0,1} channel masks selecting the VALID sub-rows/cols of a packed
    channel group (order dy, dx, c), plus the tail sizes (th, tw)."""
    if valid_hw is None:
        lh, lw = hp * p, wp * p
    else:
        lh, lw = valid_hw
    th = hp * p - lh
    tw = wp * p - lw
    mh = np.kron((np.arange(p) < p - th), np.ones(p * c)).astype(np.float32)
    mw = np.kron(
        np.ones(p), np.kron(np.arange(p) < p - tw, np.ones(c))
    ).astype(np.float32)
    return mh[None], mw[None], th, tw


def packed_instance_norm_stats(
    x3: jax.Array, m: int, interpret: bool = False
) -> jax.Array:
    """[N, M, CC] -> [N, 2, CC] f32 (sum, sumsq) per packed channel.

    Zero tail positions contribute nothing, so ragged tensors (zero-tail
    invariant, ops.packed.zero_tail) need no masking here — only the true
    pixel count at the fold step.
    """
    n, _, cc = x3.shape
    tm = _tile_rows(m, cc, x3.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_stats_kernel, m=m, tm=tm),
        grid=(n, pl.cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((1, tm, cc), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 2, cc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2, cc), jnp.float32),
        interpret=interpret,
    )(x3)


def packed_instance_norm_apply(
    x3: jax.Array,
    a: jax.Array,
    b: jax.Array,
    *,
    hp: int,
    wp: int,
    mh: np.ndarray,
    mw: np.ndarray,
    th: int,
    tw: int,
    relu: bool,
    interpret: bool = False,
) -> jax.Array:
    """[N, M, CC] -> tailmask * maybe_relu(a * x + b); a, b: [N, CC] f32."""
    n, m, cc = x3.shape
    tm = _tile_rows(m, cc, x3.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(
            _apply_kernel,
            tm=tm,
            wp=wp,
            hp=hp,
            relu=relu,
            mask_h=th > 0,
            mask_w=tw > 0,
        ),
        grid=(n, pl.cdiv(m, tm)),
        in_specs=[
            pl.BlockSpec((1, tm, cc), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tm, cc), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=interpret,
    )(
        x3,
        a[:, None, :],
        b[:, None, :],
        jnp.asarray(mh)[None],
        jnp.asarray(mw)[None],
    )


def fold_stats(
    stats: jax.Array, p: int, c: int, count: float, scale, shift, eps: float
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """[N, 2, p*p*c] stats -> per-REAL-channel (mean, rstd) [N, c] and the
    packed-channel affine (a, b) [N, p*p*c] for the apply pass."""
    n = stats.shape[0]
    sum_c = stats[:, 0].reshape(n, p * p, c).sum(axis=1)
    sq_c = stats[:, 1].reshape(n, p * p, c).sum(axis=1)
    mean = sum_c / count
    var = jnp.maximum(sq_c / count - mean * mean, 0.0)  # clamp: see module doc
    rstd = jax.lax.rsqrt(var + eps)
    a_c = scale.astype(jnp.float32)[None] * rstd
    b_c = shift.astype(jnp.float32)[None] - mean * a_c
    a = jnp.tile(a_c, (1, p * p))
    b = jnp.tile(b_c, (1, p * p))
    return mean, rstd, a, b


def instance_norm_packed_fused(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    p: int,
    eps: float = 1e-3,
    *,
    valid_hw: Optional[Tuple[int, int]] = None,
    relu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Packed-layout IN with fused relu + ragged-tail re-zeroing.

    Semantics == ops.packed: instance_norm_packed -> relu -> zero_tail (the
    lax oracle chain in transform_net's packed path), in 3 HBM passes.
    Forward only — ops.packed wraps it in the custom-VJP dispatcher.
    """
    n, hp, wp, cc = x.shape
    c = cc // (p * p)
    mh, mw, th, tw = packed_channel_tail_masks(p, c, hp, wp, valid_hw)
    lh, lw = valid_hw if valid_hw is not None else (hp * p, wp * p)
    m = hp * wp
    x3 = x.reshape(n, m, cc)
    stats = packed_instance_norm_stats(x3, m, interpret=interpret)
    _, _, a, b = fold_stats(stats, p, c, float(lh * lw), scale, shift, eps)
    y3 = packed_instance_norm_apply(
        x3, a, b, hp=hp, wp=wp, mh=mh, mw=mw, th=th, tw=tw, relu=relu,
        interpret=interpret,
    )
    return y3.reshape(n, hp, wp, cc)


def instance_norm_pallas(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    *,
    groups: int = 1,
    eps: float = 1e-3,
    relu: bool = False,
    row_chunk: int = 0,  # kept for API compat; tiles are auto-sized now
    interpret: bool = False,
) -> jax.Array:
    """[N,H,W,CC] instance norm; CC = groups*C with per-real-channel stats.

    Matches ops.layers.instance_norm (groups=1) / ops.packed.
    instance_norm_packed (groups=p*p) with optional fused relu.
    """
    del row_chunk
    p = int(round(groups**0.5))
    assert p * p == groups, groups
    return instance_norm_packed_fused(
        x, scale, shift, p, eps, relu=relu, interpret=interpret
    )
