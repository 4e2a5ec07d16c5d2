"""Pallas TPU kernel: fused instance normalization (+ optional relu).

Two-phase structure (IN needs global H,W moments before any output can be
written — SURVEY.md §7 'hard parts'):
  phase 1: one pass over HBM accumulating per-channel sum and sum-of-squares
           in VMEM scratch (both moments in a single read of x);
  phase 2: one pass computing scale/shift'd normalized values, with the
           affine transform and relu fused into the write.

Totals 2 reads + 1 write of the activation. Supports the packed layout
(ops.packed): with `groups = p*p`, the CC = groups*C channels fold their
statistics per REAL channel, exactly like instance_norm_packed.

The lax implementations in ops.layers / ops.packed are the numerical oracles;
tests run this kernel in interpret mode against them. Reachable via
`ops.packed.instance_norm_packed(..., use_pallas=True)`. NOTE: measured
SLOWER than XLA's own reduce+elementwise fusion on v5e (1.95 vs 1.38 ms at
290x500x256 bf16 — see docs/PERF.md), so the lax path remains the production
default; this kernel is kept as the measured alternative and as the pattern
for future fused variants (e.g. folding IN into a conv epilogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sum_ref, sq_ref, acc_ref):
    """Grid (N, CHUNKS): accumulate f32 sum/sumsq over row-chunks."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    x = x_ref[0].astype(jnp.float32)  # [chunk, W, CC]
    part = jnp.stack(
        [jnp.sum(x, axis=(0, 1)), jnp.sum(x * x, axis=(0, 1))], axis=0
    )  # [2, CC]

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _():
        sum_ref[0, :] = acc_ref[0, :]
        sq_ref[0, :] = acc_ref[1, :]


def _apply_kernel(x_ref, mean_ref, rstd_ref, scale_ref, shift_ref, out_ref, *, relu):
    x = x_ref[...].astype(jnp.float32)
    y = (x - mean_ref[...]) * rstd_ref[...] * scale_ref[...] + shift_ref[...]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[...] = y.astype(out_ref.dtype)


def instance_norm_pallas(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    *,
    groups: int = 1,
    eps: float = 1e-3,
    relu: bool = False,
    row_chunk: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """[N,H,W,CC] instance norm; CC = groups*C with per-real-channel stats.

    Matches ops.layers.instance_norm (groups=1) / ops.packed.
    instance_norm_packed (groups=p*p) with optional fused relu.
    `row_chunk=0` sizes blocks to a ~2 MB VMEM budget automatically.
    """
    n, h, w, cc = x.shape
    c = cc // groups
    if row_chunk <= 0:
        row_bytes = w * cc * x.dtype.itemsize
        row_chunk = max(8, min(h, (2 * 1024 * 1024) // max(1, row_bytes)))
    chunks = -(-h // row_chunk)
    pad_h = chunks * row_chunk - h
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0))) if pad_h else x

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=(n, chunks),
        in_specs=[
            pl.BlockSpec((1, row_chunk, w, cc), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cc), lambda i, j: (i, 0)),
            pl.BlockSpec((1, cc), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, cc), jnp.float32),
            jax.ShapeDtypeStruct((n, cc), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, cc), jnp.float32)],
        interpret=interpret,
    )(xp)

    # fold position groups -> per-real-channel moments (padding rows are zero
    # and inflate neither sums nor counts if we divide by the true count)
    count = h * w * groups
    sum_c = sums.reshape(n, groups, c).sum(axis=1)
    sq_c = sqs.reshape(n, groups, c).sum(axis=1)
    mean_c = sum_c / count
    # one-pass E[x^2] - mu^2 can cancel below -eps for near-constant
    # high-magnitude maps (see ops/packed.py masked-IN note) — clamp at 0
    var_c = jnp.maximum(sq_c / count - mean_c * mean_c, 0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    mean = jnp.tile(mean_c, (1, groups)).reshape(n, 1, 1, cc)
    rstd = jnp.tile(rstd_c, (1, groups)).reshape(n, 1, 1, cc)
    scale_b = jnp.tile(scale.astype(jnp.float32)[None], (n, groups)).reshape(n, 1, 1, cc)
    shift_b = jnp.tile(shift.astype(jnp.float32)[None], (n, groups)).reshape(n, 1, 1, cc)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, relu=relu),
        grid=(n, chunks),
        in_specs=[
            pl.BlockSpec((1, row_chunk, w, cc), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, cc), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, cc), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, cc), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, cc), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, row_chunk, w, cc), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(xp, mean, rstd, scale_b, shift_b)
    return out[:, :h] if pad_h else out
