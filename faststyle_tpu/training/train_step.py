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


def make_train_step(vgg_params, target_grams: Mapping[str, jax.Array], config: TrainConfig):
    """Build the (state, batch) -> (state, metrics) step function (un-jitted;
    callers wrap in jit or shard_map)."""
    content_w = dict(config.content_weights)
    style_w = dict(config.style_weights)
    all_layers = tuple(dict.fromkeys(tuple(content_w) + tuple(style_w)))
    content_layers = tuple(content_w)
    opt = make_optimizer(config)

    def train_step(state: TrainState, batch: jax.Array):
        # content targets = VGG features of the RAW batch (stop-grad by constr.)
        tgt_content = vgg16.apply(
            vgg_params,
            batch,
            content_layers,
            compute_dtype=config.compute_dtype,
            loss_layout=True,
        )

        def loss_fn(params):
            y = transform_net.apply(
                params, batch, config.upsample_method, compute_dtype=config.compute_dtype
            )
            acts = vgg16.apply(
                vgg_params,
                y,
                all_layers,
                compute_dtype=config.compute_dtype,
                loss_layout=True,
            )
            total, parts = losses.perceptual_loss(
                acts, tgt_content, target_grams, content_w, style_w, y, config.beta
            )
            return total, parts

        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), parts

    return train_step


def make_jitted_train_step(vgg_params, target_grams, config: TrainConfig):
    step = make_train_step(vgg_params, target_grams, config)
    return jax.jit(step, donate_argnums=(0,))
