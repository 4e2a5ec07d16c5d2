"""Pallas TPU kernel: normalized Gram matrix (the style-loss hot op).

gram(F[b,h,w,c]) = reshape(F,[b,hw,c])^T @ reshape(F,[b,hw,c]) / (h*w*c)

One MXU matmul per (batch, row-tile) grid step, accumulating the c x c
product in a float32 VMEM scratch and fusing the 1/(h*w*c) normalization
into the final write — the intermediate [hw, c] never round-trips and no
separate divide pass runs. The lax path (losses.gram_matrix, an einsum XLA
maps to the MXU anyway) is the oracle; selection is measurement-driven.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(x_ref, out_ref, acc_ref, *, inv_norm, hw, row_tile):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    x = x_ref[0]  # [tile, c]
    if hw % row_tile:
        # ragged hw: the last tile reads past the array bound (undefined
        # values, possibly NaN) — select them to zero so they add nothing.
        # In-kernel masking instead of a host-side jnp.pad, which would
        # round-trip a full padded copy of the features through HBM on the
        # style-loss hot path (the exact pattern that made the round-1
        # instance-norm kernel lose to XLA).
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + j * row_tile
        x = jnp.where(rows < hw, x, 0)
    part = jax.lax.dot_general(
        x, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _():
        out_ref[0] = (acc_ref[...] * inv_norm).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnames=("row_tile", "interpret"))
def gram_matrix_pallas(
    feats: jax.Array, row_tile: int = 1024, interpret: bool = False
) -> jax.Array:
    """[b,h,w,c] -> [b,c,c] normalized Gram in float32 (differentiable:
    custom VJP below, since autodiff cannot trace through pallas_call)."""
    return _gram_forward(feats, row_tile, interpret)


def _gram_forward(feats: jax.Array, row_tile: int, interpret: bool) -> jax.Array:
    b, h, w, c = feats.shape
    hw = h * w
    f = feats.reshape(b, hw, c)
    tiles = -(-hw // row_tile)

    return pl.pallas_call(
        functools.partial(
            _gram_kernel, inv_norm=1.0 / (hw * c), hw=hw, row_tile=row_tile
        ),
        grid=(b, tiles),
        in_specs=[pl.BlockSpec((1, row_tile, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, c, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        interpret=interpret,
    )(f)


def _gram_fwd(feats, row_tile, interpret):
    return _gram_forward(feats, row_tile, interpret), feats


def _gram_bwd(row_tile, interpret, feats, g_bar):
    # d/dF [F^T F / (hwc)] contracted with G_bar: F (G_bar + G_bar^T) / (hwc)
    b, h, w, c = feats.shape
    sym = (g_bar + jnp.swapaxes(g_bar, 1, 2)) / jnp.float32(h * w * c)
    f = feats.reshape(b, h * w, c).astype(jnp.float32)
    df = jnp.einsum("bnc,bcd->bnd", f, sym, preferred_element_type=jnp.float32)
    return (df.reshape(feats.shape).astype(feats.dtype),)


gram_matrix_pallas.defvjp(_gram_fwd, _gram_bwd)
