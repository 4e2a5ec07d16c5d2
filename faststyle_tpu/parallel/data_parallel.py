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

    The per-shard program runs under `shard_map`, NOT GSPMD auto-partition:
    the batched forward is a per-sample `lax.map` (the measured-faster
    program, docs/PERF.md), and a scan over a *sharded* batch axis would
    serialize across chips under the auto-partitioner — shard_map keeps each
    chip scanning only its local shard.

    Round-4: the single-chip serving fast paths (inference.Stylizer) are
    available here too — `output_uint8` (on-device clip+cast, 4x smaller
    fetches), `packed_output` (device skips the output relayout; host
    depth-to-space via the native slab pool) and `packed_input` (host
    reflect-pad+pack; device runs pure packed compute). Default output stays
    float32 NHWC for backward compatibility; any fast-path flag switches the
    return to uint8.
    """

    def __init__(
        self,
        params,
        mesh: Mesh,
        upsample_method: str = "resize",
        compute_dtype=None,
        *,
        output_uint8: bool = False,
        packed_output: bool = False,
        packed_input: bool = False,
    ):
        self._mesh = mesh
        self._sharding = batch_sharding(mesh)
        self._params = jax.device_put(
            jax.tree.map(jnp.asarray, params), NamedSharding(mesh, P())
        )
        self._output_uint8 = output_uint8 or packed_output or packed_input
        self._packed_output = packed_output
        self._packed_input = packed_input
        self._warned_quantize = False
        from faststyle_tpu.inference import make_forward

        # the ONE serving forward contract, shared with inference.Stylizer
        fwd = make_forward(
            upsample_method,
            compute_dtype,
            output_uint8=self._output_uint8,
            packed_input=packed_input,
            packed_output=packed_output,
        )

        def make(hw=None):
            return jax.jit(
                shard_map(
                    functools.partial(fwd, hw=hw),
                    mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS),
                    check_vma=False,
                )
            )

        self._make = make
        self._fns: dict = {}  # keyed by static (h, w) — None for nhwc input

    def _fn_for(self, hw=None):
        if hw not in self._fns:
            self._fns[hw] = self._make(hw)
        return self._fns[hw]

    def stylize_batch(self, imgs: np.ndarray) -> np.ndarray:
        """NHWC [0,255] float/uint8, any batch size -> stylized NHWC
        (float32 by default; uint8 with output_uint8/packed_* )."""
        imgs = np.asarray(imgs)
        n_dev = self._mesh.devices.size
        h, w = imgs.shape[1], imgs.shape[2]
        if self._packed_input:
            # the packed host pack stage is uint8-only (camera/decoder
            # contract); float frames are quantized with a one-time warning —
            # same contract as inference.Stylizer.stylize_batch
            from faststyle_tpu.inference import quantize_for_packed_input

            imgs = quantize_for_packed_input(imgs, self)
            from faststyle_tpu.inference import pack_u8_host

            padded, n = pad_batch_to_devices(pack_u8_host(imgs), n_dev)
            out = self._fn_for((h, w))(
                self._params, jax.device_put(padded, self._sharding)
            )
        else:
            if not (self._output_uint8 and imgs.dtype == np.uint8):
                imgs = np.asarray(imgs, np.float32)
            padded, n = pad_batch_to_devices(imgs, n_dev)
            out = self._fn_for(None)(
                self._params, jax.device_put(padded, self._sharding)
            )
        out = np.asarray(out)[:n]
        if self._packed_output:
            from faststyle_tpu.inference import unpack_u8_host

            oh, ow = transform_net.output_shape(h, w)
            out = unpack_u8_host(out, oh, ow)
        return out
