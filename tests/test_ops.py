"""Unit tests for layer primitives against numeric oracles derived from the
reference's formulas (SURVEY.md §2.3/§2.4) — numpy math, not TF."""

import jax.numpy as jnp
import numpy as np
import pytest

from faststyle_tpu.ops import layers as L


def test_reflect_pad_mirrors_without_edge_repeat(rng):
    x = rng.standard_normal((1, 5, 6, 2)).astype(np.float32)
    out = np.asarray(L.reflect_pad(jnp.asarray(x), 2))
    assert out.shape == (1, 9, 10, 2)
    ref = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(out, ref)


def test_instance_norm_matches_formula(rng):
    x = rng.standard_normal((2, 7, 5, 3)).astype(np.float32) * 10 + 3
    scale = rng.standard_normal(3).astype(np.float32)
    shift = rng.standard_normal(3).astype(np.float32)
    out = np.asarray(L.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift)))
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)  # biased, like tf.nn.moments
    ref = scale * ((x - mean) / np.sqrt(var + 1e-3)) + shift
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_relu_custom_vjp_matches_maximum_grad(rng):
    # relu carries a custom VJP (output-only residual, docs/PERF.md round 3);
    # grads must equal autodiff of maximum(x, 0) away from exact-zero ties.
    import jax

    x = jnp.asarray(rng.standard_normal((8, 11)).astype(np.float32))
    g_custom = jax.grad(lambda v: jnp.sum(jnp.sin(L.relu(v))))(x)
    g_stock = jax.grad(lambda v: jnp.sum(jnp.sin(jnp.maximum(v, 0))))(x)
    np.testing.assert_array_equal(np.asarray(g_custom), np.asarray(g_stock))
    # At exactly 0 we pick the TF/torch convention relu'(0) = 0.
    g0 = jax.grad(lambda v: jnp.sum(L.relu(v)))(jnp.zeros((3,)))
    np.testing.assert_array_equal(np.asarray(g0), np.zeros(3, np.float32))


def test_scaled_tanh_range_and_formula(rng):
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32) * 5
    out = np.asarray(L.scaled_tanh(jnp.asarray(x)))
    np.testing.assert_allclose(out, (255 * np.tanh(x) + 255) / 2, atol=1e-2)
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_resize_nearest_is_pixel_replication(rng):
    x = rng.standard_normal((1, 3, 2, 4)).astype(np.float32)
    out = np.asarray(L.resize_nearest(jnp.asarray(x), 4))
    assert out.shape == (1, 12, 8, 4)
    # TF1 NEAREST align_corners=False: out[i] = in[floor(i/4)]
    for i in range(12):
        for j in range(8):
            np.testing.assert_array_equal(out[0, i, j], x[0, i // 4, j // 4])


def test_conv2d_same_matches_numpy_oracle(rng):
    """SAME conv with stride 2 on an even size pads (0,1) — TF convention."""
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    w = rng.standard_normal((3, 3, 2, 4)).astype(np.float32)
    out = np.asarray(L.conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding="SAME"))
    assert out.shape == (1, 3, 3, 4)
    xp = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    ref = np.zeros((1, 3, 3, 4), np.float32)
    for oy in range(3):
        for ox in range(3):
            patch = xp[0, 2 * oy : 2 * oy + 3, 2 * ox : 2 * ox + 3, :]
            ref[0, oy, ox] = np.einsum("hwc,hwco->o", patch, w)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw", [(8, 8), (10, 14), (7, 9)])
def test_fused_upsample_conv_matches_reference_formulation(rng, hw):
    h, w = hw
    x = rng.standard_normal((2, h, w, 8)).astype(np.float32)
    k = rng.standard_normal((3, 3, 8, 4)).astype(np.float32)
    ref = np.asarray(L.upsample_conv_reference(jnp.asarray(x), jnp.asarray(k)))
    fused = np.asarray(L.upsample_conv(jnp.asarray(x), jnp.asarray(k)))
    assert fused.shape == (2, 2 * h, 2 * w, 4)
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-4)


def test_transposed_conv2d_matches_adjoint_oracle(rng):
    """Oracle: TF SAME conv2d_transpose == adjoint of SAME strided conv,
    checked via the <Ax, y> == <x, A^T y> inner-product identity."""
    x = rng.standard_normal((1, 5, 6, 3)).astype(np.float32)  # input of transpose
    w = rng.standard_normal((3, 3, 4, 3)).astype(np.float32)  # HW, out, in
    y = np.asarray(L.transposed_conv2d(jnp.asarray(x), jnp.asarray(w), stride=2))
    assert y.shape == (1, 10, 12, 4)
    # <transposed_conv(x), probe> must equal <x, conv(probe, w, s2, SAME)>
    probe = np.random.default_rng(1).standard_normal(y.shape).astype(np.float32)
    conv_probe = np.asarray(
        L.conv2d(jnp.asarray(probe), jnp.asarray(w), stride=2, padding="SAME")
    )
    lhs = float((y * probe).sum())
    rhs = float((x * conv_probe).sum())
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3)


def test_max_pool_2x2_same(rng):
    x = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    out = np.asarray(L.max_pool_2x2_same(jnp.asarray(x)))
    assert out.shape == (1, 3, 3, 2)
    xp = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=-np.inf)
    for oy in range(3):
        for ox in range(3):
            np.testing.assert_array_equal(
                out[0, oy, ox], xp[0, 2 * oy : 2 * oy + 2, 2 * ox : 2 * ox + 2].max(axis=(0, 1))
            )


def test_image_io_pil_fallback_matches_cv2(tmp_path, monkeypatch):
    """cv2 is optional (SURVEY §2.1-6): the PIL fallback must honor the same
    RGB/uint8 contract for read/decode/write. Pixel equality is exact for
    lossless I/O; resize interpolations legitimately differ, so only the
    I/O trio is pinned."""
    from faststyle_tpu.utils import image_io

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    image_io.imwrite(p, img)
    with_cv2 = image_io.imread(p)
    data = p.read_bytes()
    monkeypatch.setattr(image_io, "_HAVE_CV2", False)
    np.testing.assert_array_equal(image_io.imread(p), with_cv2)
    np.testing.assert_array_equal(image_io.imdecode(data), with_cv2)
    p2 = tmp_path / "y.png"
    image_io.imwrite(p2, img.astype(np.float32) + 0.4)  # float clip path
    monkeypatch.setattr(image_io, "_HAVE_CV2", True)
    np.testing.assert_array_equal(image_io.imread(p2), img)
