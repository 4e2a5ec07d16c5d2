"""Gatys-style direct pixel optimization (the reference's slow_style.py).

The reference runs one Session.run per Adam step with the image as a
tf.Variable (slow_style.py:117-176). Here the whole optimization is a single
jitted `lax.scan` over Adam updates — target features, forward, backward and
the update all stay on device; the host only sees periodic loss scalars.

Fidelity notes (SURVEY.md §3.4):
  * pixels init to uniform white noise * 255 (slow_style.py:117-121)
  * Adam(lr default 1e1) on the PIXELS only (slow_style.py:148-154)
  * loss = content + style + beta*tv, default beta 1e-4
  * no clamping to [0,255] during or after optimization — the image writer
    clips at save time, matching cv2's cast behavior in the reference
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from faststyle_tpu import losses
from faststyle_tpu.models import vgg16


def style_target_grams(
    vgg_params, style_img: np.ndarray, style_layers: tuple[str, ...]
) -> Dict[str, jax.Array]:
    """Precompute the style image's normalized Gram matrices (one jitted call;
    the reference's 'Phase A', train.py:134-151 / slow_style.py:94-103)."""

    @jax.jit
    def grams(params, img):
        acts = vgg16.apply(params, img, style_layers, loss_layout=True)
        return {l: losses.gram_matrix(acts[l]) for l in style_layers}

    return grams(vgg_params, jnp.asarray(style_img, jnp.float32))


def content_targets(
    vgg_params, content_img: np.ndarray, content_layers: tuple[str, ...]
) -> Dict[str, jax.Array]:
    @jax.jit
    def feats(params, img):
        return vgg16.apply(params, img, content_layers, loss_layout=True)

    return feats(vgg_params, jnp.asarray(content_img, jnp.float32))


def optimize(
    vgg_params,
    content_img: np.ndarray,
    style_img: np.ndarray,
    *,
    content_weights: Mapping[str, float],
    style_weights: Mapping[str, float],
    beta: float = 1e-4,
    learn_rate: float = 1e1,
    num_steps: int = 500,
    log_every: int = 10,
    seed: int = 0,
    log_fn: Optional[Callable[[int, float], None]] = None,
    compute_dtype=None,
) -> np.ndarray:
    """Run the pixel optimization; returns the HWC float image (unclamped)."""
    content_img = np.asarray(content_img, np.float32)
    if content_img.ndim == 3:
        content_img = content_img[None]
    if style_img.ndim == 3:
        style_img = style_img[None]

    c_layers = tuple(content_weights)
    s_layers = tuple(style_weights)
    all_layers = tuple(dict.fromkeys(c_layers + s_layers))
    if not all_layers:
        raise ValueError("need at least one content or style layer")

    # single-sided runs are legitimate (style-only = texture synthesis);
    # skip the absent side's target pass instead of handing vgg16.apply an
    # empty layer list
    tgt_grams = style_target_grams(vgg_params, style_img, s_layers) if s_layers else {}
    tgt_content = content_targets(vgg_params, content_img, c_layers) if c_layers else {}

    # white-noise init, uniform [0,255] (reference slow_style.py:118-119)
    key = jax.random.PRNGKey(seed)
    pixels = jax.random.uniform(key, content_img.shape, jnp.float32) * 255.0

    opt = optax.adam(learn_rate)
    opt_state = opt.init(pixels)

    def loss_fn(px):
        acts = vgg16.apply(
            vgg_params, px, all_layers, compute_dtype=compute_dtype, loss_layout=True
        )
        total, _parts = losses.perceptual_loss(
            acts, tgt_content, tgt_grams, content_weights, style_weights, px, beta
        )
        return total

    @functools.partial(jax.jit, static_argnames="length")
    def run_chunk(px, opt_state, length):
        def step(carry, _):
            px, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(px)
            updates, opt_state = opt.update(grads, opt_state)
            px = optax.apply_updates(px, updates)
            return (px, opt_state), loss

        (px, opt_state), chunk_losses = jax.lax.scan(
            step, (px, opt_state), None, length=length
        )
        return px, opt_state, chunk_losses

    if log_every <= 0:
        log_every = num_steps  # "no periodic logging" -> one chunk
    done = 0
    while done < num_steps:
        length = min(log_every, num_steps - done)  # never exceed the budget
        pixels, opt_state, chunk_losses = run_chunk(pixels, opt_state, length)
        done += length
        if log_fn is not None:
            log_fn(done, float(chunk_losses[-1]))

    return np.asarray(pixels[0])
