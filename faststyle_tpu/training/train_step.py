"""Single-jit perceptual-loss training step.

The reference crosses the host<->device boundary 4x per step and runs VGG on
the batch in a separate Session.run to collect content targets
(train.py:245-275, the feed-Y trick at :250-251). Here the whole step —
content-target VGG pass on the raw batch, transform-net forward, VGG on the
stylized output, all losses, backward, Adam update — is ONE jitted function;
the host only feeds batches and reads scalar metrics.

Used directly for single-chip training and wrapped by parallel.data_parallel
for multi-chip (shard_map + psum over the 'data' mesh axis).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from faststyle_tpu import losses
from faststyle_tpu.models import transform_net, vgg16


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class TrainConfig(NamedTuple):
    content_weights: Tuple[Tuple[str, float], ...]
    style_weights: Tuple[Tuple[str, float], ...]
    beta: float
    learn_rate: float
    upsample_method: str = "resize"
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for the conv stacks

    @staticmethod
    def make(
        content_layers=("conv3_3",),
        content_weights=(1.0,),
        style_layers=("conv1_2", "conv2_2", "conv3_3", "conv4_3"),
        style_weights=(5.0, 5.0, 5.0, 5.0),
        beta: float = 0.0,
        learn_rate: float = 1e-3,
        upsample_method: str = "resize",
        compute_dtype=None,
    ) -> "TrainConfig":
        """Defaults = the reference training recipe (train.py:34-104)."""
        if len(content_layers) != len(content_weights):
            raise ValueError(
                f"{len(content_layers)} content layers but {len(content_weights)} weights"
            )
        if len(style_layers) != len(style_weights):
            raise ValueError(
                f"{len(style_layers)} style layers but {len(style_weights)} weights"
            )
        return TrainConfig(
            tuple(zip(content_layers, content_weights)),
            tuple(zip(style_layers, style_weights)),
            beta,
            learn_rate,
            upsample_method,
            compute_dtype,
        )


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    # tf.train.AdamOptimizer defaults: b1=0.9, b2=0.999, eps=1e-8 (train.py:203)
    return optax.adam(config.learn_rate)


def init_state(rng: jax.Array, config: TrainConfig, params=None) -> TrainState:
    if params is None:
        params = transform_net.init_params(rng, config.upsample_method)
    opt = make_optimizer(config)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def make_grad_fn(
    vgg_params,
    target_grams: Mapping[str, jax.Array],
    config: TrainConfig,
    *,
    fused_content_tower: bool = False,
):
    """Build the shared loss/backward: (params, batch) -> (metrics, grads).

    This is the ONE definition of the training loss — `make_train_step`
    (single chip) applies the optimizer directly; `parallel.data_parallel.
    make_dp_train_step` psums grads/metrics over the mesh first. Keeping it
    factored means layout/batch-mode wins (e.g. batch_mode='unroll') land on
    both paths at once.

    `fused_content_tower=True` runs ONE VGG pass on concat([batch, y]) up to
    the pool boundary after the deepest content layer (fatter batch-2N
    matmuls, one tower prefix instead of two), then continues only the y
    half into the deeper style blocks. Mathematically identical: the batch
    half is stop-gradded, so only backward input-grad convs widen. Measured
    SLOWER at b4@256 bf16 (13.9 -> 14.5 ms/step, docs/PERF.md: the widened
    backward through blocks 1-3 costs more than the merged forward saves) —
    kept reachable for re-measurement at other shapes, default off."""
    content_w = dict(config.content_weights)
    style_w = dict(config.style_weights)
    all_layers = tuple(dict.fromkeys(tuple(content_w) + tuple(style_w)))
    content_layers = tuple(content_w)
    if not all_layers:
        raise ValueError("need at least one content or style layer")
    if fused_content_tower and not content_layers:
        # nothing to fuse without a content tower; fall back to the plain
        # form instead of crashing on the split-pool computation below
        fused_content_tower = False

    if fused_content_tower:
        # pool boundary after the deepest content layer: the joint [batch; y]
        # prefix must cover every content layer AND stop on an unpacked layout
        deepest_content = max(vgg16.layer_index(l) for l in content_layers)
        split_pool = next(
            name
            for name in vgg16.LAYER_ORDER[deepest_content:]
            if name.startswith("pool")
        )
        prefix_layers = tuple(
            dict.fromkeys(
                tuple(
                    l
                    for l in all_layers
                    if vgg16.layer_index(l) <= vgg16.layer_index(split_pool)
                )
                + (split_pool,)
            )
        )
        suffix_layers = tuple(
            l for l in all_layers if vgg16.layer_index(l) > vgg16.layer_index(split_pool)
        )

    def split_halves(act, n):
        if isinstance(act, vgg16.PackedActivation):
            return vgg16.PackedActivation(act.data[:n]), vgg16.PackedActivation(act.data[n:])
        return act[:n], act[n:]

    def grad_fn(params, batch: jax.Array):
        if not fused_content_tower:
            # content targets = VGG features of the RAW batch (stop-grad by
            # construction); style-only configs skip the pass entirely
            tgt_content = (
                vgg16.apply(
                    vgg_params,
                    batch,
                    content_layers,
                    compute_dtype=config.compute_dtype,
                    loss_layout=True,
                )
                if content_layers
                else {}
            )

        def loss_fn(params):
            # batch_mode='unroll': per-sample b=1 conv programs (like the
            # inference-default 'map') but as independent subgraphs, so XLA
            # interleaves samples and tree-sums the packed-kernel cotangents
            # instead of serializing them through a scan carry — measured
            # 12.8 -> 11.4 ms/step at b4@256 bf16 (docs/PERF.md round 3)
            y = transform_net.apply(
                params,
                batch,
                config.upsample_method,
                compute_dtype=config.compute_dtype,
                batch_mode="unroll",
            )
            if fused_content_tower:
                n = batch.shape[0]
                pair = jnp.concatenate([batch, y.astype(batch.dtype)], axis=0)
                joint = vgg16.apply(
                    vgg_params,
                    pair,
                    prefix_layers,
                    compute_dtype=config.compute_dtype,
                    loss_layout=True,
                )
                tgt, acts = {}, {}
                for name, act in joint.items():
                    b_half, y_half = split_halves(act, n)
                    acts[name] = y_half
                    if name in content_w:
                        tgt[name] = jax.lax.stop_gradient(b_half)
                # the split-pool activation seeds the continuation; drop it
                # from the loss dict only if it is NOT itself a loss layer
                pool_act = acts[split_pool] if split_pool in all_layers else acts.pop(split_pool)
                if suffix_layers:
                    acts.update(
                        vgg16.apply(
                            vgg_params,
                            pool_act,
                            suffix_layers,
                            compute_dtype=config.compute_dtype,
                            input_layer=split_pool,
                        )
                    )
            else:
                tgt = tgt_content
                acts = vgg16.apply(
                    vgg_params,
                    y,
                    all_layers,
                    compute_dtype=config.compute_dtype,
                    loss_layout=True,
                )
            total, parts = losses.perceptual_loss(
                acts, tgt, target_grams, content_w, style_w, y, config.beta
            )
            return total, parts

        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return parts, grads

    return grad_fn


def make_train_step(
    vgg_params,
    target_grams: Mapping[str, jax.Array],
    config: TrainConfig,
    *,
    fused_content_tower: bool = False,
):
    """Build the (state, batch) -> (state, metrics) step function (un-jitted;
    callers wrap in jit). Loss/backward shared with the DP step via
    `make_grad_fn` (see its docstring for the fused_content_tower knob)."""
    grad_fn = make_grad_fn(
        vgg_params, target_grams, config, fused_content_tower=fused_content_tower
    )
    opt = make_optimizer(config)

    def train_step(state: TrainState, batch: jax.Array):
        parts, grads = grad_fn(state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), parts

    return train_step


def make_jitted_train_step(vgg_params, target_grams, config: TrainConfig, **kw):
    step = make_train_step(vgg_params, target_grams, config, **kw)
    return jax.jit(step, donate_argnums=(0,))
