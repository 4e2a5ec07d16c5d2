"""VGG16 tower: preprocessing, truncation, layer shapes, npz loading."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faststyle_tpu.models import vgg16


@pytest.fixture(scope="module")
def params():
    return vgg16.init_params(jax.random.PRNGKey(0))


def test_layer_order():
    assert vgg16.LAYER_ORDER[:4] == ["conv1_1", "conv1_2", "pool1", "conv2_1"]
    assert vgg16.LAYER_ORDER[-1] == "pool5"
    assert len(vgg16.LAYER_ORDER) == 13 + 5


def test_mean_subtraction_only(params):
    """Input preprocessing = subtract ImageNet means, no scaling
    (reference libs/vgg16.py:40-42)."""
    x = jnp.full((1, 4, 4, 3), 123.68)
    acts = vgg16.apply(params, x, ["conv1_1"])
    # channel 0 becomes exactly zero pre-conv; with zero bias the output is
    # then conv of [0, 116.779-123.68.., ...] — just check it runs and shape
    assert acts["conv1_1"].shape == (1, 4, 4, 64)


def test_shapes_full_tower(params):
    x = jnp.zeros((2, 64, 64, 3))
    acts = vgg16.apply(params, x)
    assert acts["conv1_2"].shape == (2, 64, 64, 64)
    assert acts["pool1"].shape == (2, 32, 32, 64)
    assert acts["conv2_2"].shape == (2, 32, 32, 128)
    assert acts["conv3_3"].shape == (2, 16, 16, 256)
    assert acts["conv4_3"].shape == (2, 8, 8, 512)
    assert acts["pool5"].shape == (2, 2, 2, 512)


def test_truncation_returns_only_requested(params):
    x = jnp.zeros((1, 32, 32, 3))
    acts = vgg16.apply(params, x, ["conv1_2", "conv2_2"])
    assert set(acts) == {"conv1_2", "conv2_2"}


def test_truncation_skips_deeper_compute(params):
    """Requesting conv1_2 must not build conv5 — check via jaxpr size."""
    x = jnp.zeros((1, 32, 32, 3))
    shallow = jax.make_jaxpr(lambda p, y: vgg16.apply(p, y, ["conv1_2"]))(params, x)
    deep = jax.make_jaxpr(lambda p, y: vgg16.apply(p, y, ["conv5_3"]))(params, x)
    assert len(shallow.jaxpr.eqns) < len(deep.jaxpr.eqns) / 2


def test_unknown_layer_raises(params):
    with pytest.raises(ValueError, match="unknown"):
        vgg16.apply(params, jnp.zeros((1, 8, 8, 3)), ["conv9_9"])


def test_matches_tf_oracle(params):
    """Cross-check the tower against tf.nn ops when TF is available."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32)
    acts = vgg16.apply(jax.tree.map(np.asarray, params), jnp.asarray(x), ["conv2_1"])

    h = tf.constant(x) - tf.constant([123.68, 116.779, 103.939], shape=[1, 1, 1, 3])
    p = jax.tree.map(np.asarray, params)
    for name in ["conv1_1", "conv1_2"]:
        h = tf.nn.relu(tf.nn.bias_add(tf.nn.conv2d(h, p[name]["W"], [1, 1, 1, 1], "SAME"), p[name]["b"]))
    h = tf.nn.max_pool2d(h, 2, 2, "SAME")
    h = tf.nn.relu(tf.nn.bias_add(tf.nn.conv2d(h, p["conv2_1"]["W"], [1, 1, 1, 1], "SAME"), p["conv2_1"]["b"]))
    np.testing.assert_allclose(np.asarray(acts["conv2_1"]), h.numpy(), rtol=1e-4, atol=1e-4)


def test_load_npz_schema(tmp_path):
    """Loader accepts the Frossard key schema (conv1_1_W / conv1_1_b, fc* skipped)."""
    rng = np.random.default_rng(0)
    data = {}
    cin = 3
    for gi, group in enumerate(vgg16._GROUPS, start=1):
        cout = vgg16._CHANNELS[gi]
        for name in group:
            data[f"{name}_W"] = rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
            data[f"{name}_b"] = rng.standard_normal((cout,)).astype(np.float32)
            cin = cout
    data["fc6_W"] = np.zeros((4, 4), np.float32)  # must be ignored
    path = tmp_path / "vgg16_weights.npz"
    np.savez(path, **data)
    params = vgg16.load_npz(path)
    assert "fc6" not in params
    np.testing.assert_array_equal(params["conv3_2"]["W"], data["conv3_2_W"])
    np.testing.assert_array_equal(params["conv5_3"]["b"], data["conv5_3_b"])


def test_loss_layout_packed_block1(params):
    """loss_layout=True: pool1+ exactly match, block-1 activations come back
    as PackedActivation whose folded Gram and elementwise losses equal the
    naive tower's (position-permutation invariance)."""
    from faststyle_tpu import losses

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)), jnp.float32)
    want = ("conv1_2", "pool1", "conv2_2", "conv3_3")
    a0 = vgg16.apply(params, x, want)
    a1 = vgg16.apply(params, x, want, loss_layout=True)
    for l in ("pool1", "conv2_2", "conv3_3"):
        np.testing.assert_allclose(np.asarray(a1[l]), np.asarray(a0[l]), atol=2e-2)
    assert isinstance(a1["conv1_2"], vgg16.PackedActivation)
    g0 = np.asarray(losses.gram_matrix(a0["conv1_2"]))
    g1 = np.asarray(losses.gram_matrix(a1["conv1_2"]))
    assert g0.shape == g1.shape
    np.testing.assert_allclose(g1, g0, rtol=1e-4, atol=1e-4)
    # content loss packed-to-packed == naive-to-naive (same normalizer)
    y = jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)), jnp.float32)
    b0 = vgg16.apply(params, y, ("conv1_2",))
    b1 = vgg16.apply(params, y, ("conv1_2",), loss_layout=True)
    w = {"conv1_2": 1.0}
    c0 = float(losses.content_loss(a0, b0, w))
    c1 = float(losses.content_loss(a1, b1, w))
    np.testing.assert_allclose(c1, c0, rtol=1e-5)


def test_loss_layout_odd_size_falls_back(params):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (1, 63, 96, 3)), jnp.float32)
    a = vgg16.apply(params, x, ("conv1_2",), loss_layout=True)
    assert not isinstance(a["conv1_2"], vgg16.PackedActivation)
    assert a["conv1_2"].shape == (1, 63, 96, 64)


def test_loss_layout_gradients_finite(params):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)), jnp.float32)

    def f(xx):
        from faststyle_tpu import losses

        acts = vgg16.apply(params, xx, ("conv1_2", "conv2_2"), loss_layout=True)
        return jnp.sum(losses.gram_matrix(acts["conv1_2"]) ** 2) + jnp.sum(
            acts["conv2_2"] ** 2
        )

    g = jax.grad(f)(x)
    assert bool(jnp.isfinite(g).all())


def test_input_layer_mixed_request_raises(params):
    """Layers at or below the input_layer boundary can't be computed from it;
    a mixed request must raise, not silently drop the shallow activations."""
    import pytest

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 128)), jnp.float32)
    with pytest.raises(ValueError, match="at or below input_layer"):
        vgg16.apply(params, x, ("conv1_2", "conv4_1"), input_layer="pool2")
