"""Loss math vs numpy oracles derived from the reference formulas (§2.4)."""

import jax.numpy as jnp
import numpy as np

from faststyle_tpu import losses


def test_gram_matrix_formula(rng):
    x = rng.standard_normal((2, 4, 5, 3)).astype(np.float32)
    g = np.asarray(losses.gram_matrix(jnp.asarray(x)))
    f = x.reshape(2, 20, 3)
    ref = np.einsum("bnc,bnd->bcd", f, f) / (4 * 5 * 3)
    np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-6)
    assert g.shape == (2, 3, 3)


def test_content_loss_normalization(rng):
    a = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    t = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    out = float(losses.content_loss({"l": jnp.asarray(a)}, {"l": jnp.asarray(t)}, {"l": 2.5}))
    # normalized by h*w*c but NOT by batch (reference losses.py:32-37)
    ref = 2.5 * np.sum((a - t) ** 2) / (4 * 4 * 8)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_style_loss_broadcasts_single_image_target(rng):
    g = rng.standard_normal((3, 4, 4)).astype(np.float32)  # batch of grams
    t = rng.standard_normal((1, 4, 4)).astype(np.float32)  # single-image target
    out = float(losses.style_loss({"l": jnp.asarray(g)}, {"l": jnp.asarray(t)}, {"l": 5.0}))
    ref = 5.0 * np.sum((g - t) ** 2) / (4 * 4)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_tv_loss_matches_reference_conv_formulation(rng):
    """The reference computes TV via VALID convs with +/-identity filters
    (losses.py:86-95); that equals the sum of squared adjacent diffs."""
    x = rng.standard_normal((2, 6, 7, 3)).astype(np.float32)
    out = float(losses.tv_loss(jnp.asarray(x)))
    vdiff = x[:, 1:, :, :] - x[:, :-1, :, :]
    hdiff = x[:, :, 1:, :] - x[:, :, :-1, :]
    ref = (hdiff**2).sum() + (vdiff**2).sum()
    np.testing.assert_allclose(out, ref, rtol=1e-5)
    assert out >= 0


def test_perceptual_loss_composition(rng):
    acts = {"conv1_2": jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32)),
            "conv3_3": jnp.asarray(rng.standard_normal((1, 2, 2, 16)).astype(np.float32))}
    tgt_grams = {"conv1_2": losses.gram_matrix(acts["conv1_2"] * 0.5)}
    content_tgts = {"conv3_3": acts["conv3_3"] * 0.9}
    stylized = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    total, parts = losses.perceptual_loss(
        acts, content_tgts, tgt_grams, {"conv3_3": 1.0}, {"conv1_2": 5.0}, stylized, beta=1e-4
    )
    np.testing.assert_allclose(
        float(total),
        float(parts["content_loss"]) + float(parts["style_loss"]) + float(parts["tv_loss"]),
        rtol=1e-5,
    )
