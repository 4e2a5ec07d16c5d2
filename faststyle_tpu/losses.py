"""Perceptual losses: content, Gram-matrix style, total variation.

Exact math from the reference (SURVEY.md §2.4, losses.py / utils.py):

  gram(F[b,h,w,c])   = F'^T F' / (h*w*c), F' = reshape(F, [b, h*w, c])
                                                     (utils.py:66-83)
  content_loss       = sum_i w_i * sum((A_i - T_i)^2) / (h_i*w_i*c_i)
                       — NOT normalized by batch        (losses.py:12-40)
  style_loss         = sum_i w_i * sum((G_i - G*_i)^2) / (c_i*c_i)
                       — single-image target Gram broadcasts over batch
                                                        (losses.py:43-67)
  tv_loss            = sum(hdiff^2) + sum(vdiff^2), unnormalized
                       (losses.py:70-97 builds this from identity-filter
                       convs; differences of adjacent pixels are the same
                       computation without the conv machinery)

On TPU the Gram matrix is the hot op: a batched [hw,c]x[hw,c] matmul that
XLA maps straight onto the MXU (the pallas variant fuses the normalization).
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import jax
import jax.numpy as jnp

from faststyle_tpu.models.vgg16 import PackedActivation


def gram_matrix(feats) -> jax.Array:
    """[b,h,w,c] -> [b,c,c] normalized Gram, accumulated in float32.

    On TPU, large feature maps route through the Pallas kernel
    (ops.pallas.gram — fused normalization, measured ~1.3x over the XLA
    einsum at hw >= 16K); small maps and other backends use the einsum.

    Accepts vgg16.PackedActivation (space-to-depth block-1 features,
    [b,h',w',4c]): the packed Gram G_big [4c,4c] is computed on the MXU as
    usual — its normalizer h'·w'·4c equals the real h·w·c — and the real
    Gram is the sum of its 4 diagonal c x c phase blocks (exactly the
    reference Gram, summed in a different position order).
    """
    phases = 1
    if isinstance(feats, PackedActivation):
        phases = PackedActivation.PHASES
        feats = feats.data
    b, h, w, c = feats.shape
    if h * w >= 16384 and jax.default_backend() == "tpu":
        from faststyle_tpu.ops.pallas.gram import gram_matrix_pallas

        g = gram_matrix_pallas(feats)
    else:
        f = feats.reshape(b, h * w, c)
        g = jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=jnp.float32)
        g = g / jnp.float32(h * w * c)
    if phases > 1:
        cr = c // phases
        g = jnp.einsum("bpcpd->bcd", g.reshape(b, phases, cr, phases, cr))
    return g


def content_loss(
    layers: Mapping[str, jax.Array],
    targets: Mapping[str, jax.Array],
    weights: Mapping[str, float],
) -> jax.Array:
    total = jnp.float32(0)
    for name, weight in weights.items():
        act, tgt = layers[name], targets[name]
        if isinstance(act, PackedActivation):  # packed-to-packed:
            # elementwise diff is a position permutation of the real one,
            # and h'·w'·4c == the real h·w·c normalizer
            act, tgt = act.data, tgt.data
        act = act.astype(jnp.float32)
        tgt = tgt.astype(jnp.float32)
        _, h, w, c = act.shape
        total += weight * jnp.sum(jnp.square(act - tgt)) / jnp.float32(h * w * c)
    return total


def style_loss(
    grams: Mapping[str, jax.Array],
    target_grams: Mapping[str, jax.Array],
    weights: Mapping[str, float],
) -> jax.Array:
    total = jnp.float32(0)
    for name, weight in weights.items():
        g = grams[name].astype(jnp.float32)
        t = target_grams[name].astype(jnp.float32)  # [1,c,c] broadcasts over batch
        c = g.shape[-1]
        total += weight * jnp.sum(jnp.square(g - t)) / jnp.float32(c * c)
    return total


def tv_loss(x: jax.Array) -> jax.Array:
    """Unnormalized total variation: sum of squared adjacent-pixel diffs in
    H and W. The reference computes the identical quantity with VALID
    identity-kernel convolutions (losses.py:86-95); plain slicing is the
    same math with no conv overhead."""
    xf = x.astype(jnp.float32)
    vdiff = xf[:, 1:, :, :] - xf[:, :-1, :, :]
    hdiff = xf[:, :, 1:, :] - xf[:, :, :-1, :]
    return jnp.sum(jnp.square(hdiff)) + jnp.sum(jnp.square(vdiff))


def perceptual_loss(
    vgg_acts: Mapping[str, jax.Array],
    content_targets: Mapping[str, jax.Array],
    target_grams: Mapping[str, jax.Array],
    content_weights: Mapping[str, float],
    style_weights: Mapping[str, float],
    stylized: jax.Array,
    beta: float | jax.Array,
) -> tuple[jax.Array, Dict[str, jax.Array]]:
    """Combined loss + per-term breakdown (the reference's four TB scalars,
    train.py:185-189)."""
    grams = {name: gram_matrix(vgg_acts[name]) for name in style_weights}
    c_loss = content_loss(vgg_acts, content_targets, content_weights)
    s_loss = style_loss(grams, target_grams, style_weights)
    t_loss = tv_loss(stylized)
    total = c_loss + s_loss + beta * t_loss
    return total, {
        "loss": total,
        "content_loss": c_loss,
        "style_loss": s_loss,
        "tv_loss": beta * t_loss,
    }
