"""Multi-chip data parallelism: shard_map train step + batch-sharded inference.

New first-class capability over the reference (which is single-device,
SURVEY.md §2.6). Design per the standard TPU recipe: 1-D mesh, batch sharded
on the 'data' axis, ~424K params fully replicated, gradients all-reduced with
`jax.lax.psum` riding ICI.

Numerics note: every loss term is a SUM over the batch (reference
normalizations divide by h*w*c or c*c only — losses.py:32-37,61-64), so
psum-of-grads makes the N-chip step exactly the single-chip step on the
concatenated batch. Instance-norm statistics are per-sample, so batch
sharding never crosses a collective. Verified in tests by N=8-vs-1 equality
on the CPU-simulated mesh.
"""

from __future__ import annotations

import functools
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from faststyle_tpu.models import transform_net
from faststyle_tpu.parallel.mesh import DATA_AXIS, batch_sharding, pad_batch_to_devices
from faststyle_tpu.training.train_step import (
    TrainConfig,
    TrainState,
    make_grad_fn,
    make_optimizer,
)


def make_dp_train_step(
    vgg_params,
    target_grams: Mapping[str, jax.Array],
    config: TrainConfig,
    mesh: Mesh,
    *,
    fused_content_tower: bool = False,
):
    """(replicated state, batch sharded on 'data') -> (state, metrics).

    The loss/backward is `train_step.make_grad_fn` — the SAME definition the
    single-chip step uses (batch-mode/layout wins included) — run per shard
    on the local batch; `psum` over 'data' of grads and loss terms reproduces
    the global-batch step exactly.
    """
    grad_fn = make_grad_fn(
        vgg_params, target_grams, config, fused_content_tower=fused_content_tower
    )
    opt = make_optimizer(config)

    def local_step(state: TrainState, batch: jax.Array):
        parts, grads = grad_fn(state.params, batch)
        # the only collectives in the step: grad + metric all-reduce over ICI
        grads = jax.lax.psum(grads, DATA_AXIS)
        parts = jax.lax.psum(parts, DATA_AXIS)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), parts

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


class ShardedStylizer:
    """Batch-sharded inference over a mesh: N images spread across N chips.

    The multi-chip path of BASELINE.json config #5 (batched 1080p
    stylization). Params are replicated; each chip stylizes its shard of the
    batch independently (no collectives — instance norm is per-sample).
    """

    def __init__(self, params, mesh: Mesh, upsample_method: str = "resize", compute_dtype=None):
        self._mesh = mesh
        self._sharding = batch_sharding(mesh)
        self._params = jax.device_put(
            jax.tree.map(jnp.asarray, params), NamedSharding(mesh, P())
        )
        self._fn = jax.jit(
            functools.partial(
                transform_net.apply,
                upsample_method=upsample_method,
                compute_dtype=compute_dtype,
            ),
            out_shardings=self._sharding,
        )

    def stylize_batch(self, imgs: np.ndarray) -> np.ndarray:
        """NHWC [0,255] float/uint8, any batch size -> stylized float32 NHWC."""
        imgs = np.asarray(imgs, np.float32)
        padded, n = pad_batch_to_devices(imgs, self._mesh.devices.size)
        x = jax.device_put(padded, self._sharding)
        out = self._fn(self._params, x)
        return np.asarray(out)[:n]
