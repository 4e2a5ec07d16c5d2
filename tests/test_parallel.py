"""Multi-chip tests on the 8-virtual-device CPU mesh (SURVEY.md §4):
DP train step == single-device step on the concatenated batch; sharded
inference == single-device inference; dryrun entry point."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faststyle_tpu.models import transform_net, vgg16
from faststyle_tpu.parallel import data_parallel, mesh as mesh_lib
from faststyle_tpu.training import slow_style
from faststyle_tpu.training.train_step import (
    TrainConfig,
    init_state,
    make_jitted_train_step,
)

SIZE = 32


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    vgg_params = vgg16.init_params(jax.random.PRNGKey(0))
    config = TrainConfig.make(
        content_layers=("conv2_2",),
        content_weights=(1.0,),
        style_layers=("conv1_2",),
        style_weights=(5.0,),
        beta=1e-6,
        learn_rate=1e-3,
    )
    style = rng.uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)
    grams = slow_style.style_target_grams(vgg_params, style, ("conv1_2",))
    return vgg_params, config, grams


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual CPU devices"


@pytest.mark.slow
def test_dp_train_step_matches_single_device(setup):
    vgg_params, config, grams = setup
    mesh = mesh_lib.data_mesh()
    n_dev = mesh.devices.size

    batch = np.random.default_rng(1).uniform(0, 255, (n_dev, SIZE, SIZE, 3)).astype(np.float32)

    single = make_jitted_train_step(vgg_params, grams, config)
    state_s = init_state(jax.random.PRNGKey(7), config)
    state_s, metrics_s = single(state_s, jnp.asarray(batch))

    dp = data_parallel.make_dp_train_step(vgg_params, grams, config, mesh)
    state_d = init_state(jax.random.PRNGKey(7), config)
    batch_dev = jax.device_put(batch, mesh_lib.batch_sharding(mesh))
    state_d, metrics_d = dp(state_d, batch_dev)

    np.testing.assert_allclose(
        float(metrics_s["loss"]), float(metrics_d["loss"]), rtol=1e-4
    )
    # atol bound: a near-zero gradient element can flip the sign of Adam's
    # normalized update under reordered fp sums — one element may differ by
    # up to ~2*lr after a step; everything else matches tightly.
    for a, b in zip(jax.tree.leaves(state_s.params), jax.tree.leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=3e-3)


@pytest.mark.slow
def test_dp_multiple_steps_stay_in_sync(setup):
    vgg_params, config, grams = setup
    mesh = mesh_lib.data_mesh()
    n_dev = mesh.devices.size
    rng = np.random.default_rng(2)

    single = make_jitted_train_step(vgg_params, grams, config)
    dp = data_parallel.make_dp_train_step(vgg_params, grams, config, mesh)
    state_s = init_state(jax.random.PRNGKey(3), config)
    state_d = init_state(jax.random.PRNGKey(3), config)
    for _ in range(3):
        batch = rng.uniform(0, 255, (n_dev, SIZE, SIZE, 3)).astype(np.float32)
        state_s, _ = single(state_s, jnp.asarray(batch))
        state_d, _ = dp(state_d, jax.device_put(batch, mesh_lib.batch_sharding(mesh)))
    # accumulation order differs (psum of partials vs one global sum); Adam
    # amplifies ~ulp differences on near-zero params over steps — bound abs drift
    for a, b in zip(jax.tree.leaves(state_s.params), jax.tree.leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=2e-3)


def test_sharded_stylizer_matches_single_device(starry_params):
    mesh = mesh_lib.data_mesh()
    rng = np.random.default_rng(0)
    batch = rng.uniform(0, 255, (8, SIZE, SIZE, 3)).astype(np.float32)
    sharded = data_parallel.ShardedStylizer(starry_params, mesh)
    out_sharded = sharded.stylize_batch(batch)
    out_single = np.asarray(transform_net.apply(starry_params, jnp.asarray(batch)))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-4, atol=1e-2)


def test_sharded_stylizer_pads_non_divisible_batches(starry_params):
    mesh = mesh_lib.data_mesh()
    batch = np.random.default_rng(0).uniform(0, 255, (5, SIZE, SIZE, 3)).astype(np.float32)
    out = data_parallel.ShardedStylizer(starry_params, mesh).stylize_batch(batch)
    assert out.shape == (5, SIZE, SIZE, 3)


def test_sharded_stylizer_uint8_matches_single(starry_params):
    """Round-4: the multi-chip path carries the uint8 serving fast path too
    (on-device clip+cast, uint8 in/out) — equality vs the single-chip
    Stylizer on a non-divisible batch."""
    from faststyle_tpu.inference import Stylizer

    mesh = mesh_lib.data_mesh()
    rng = np.random.default_rng(5)
    batch = rng.integers(0, 256, (5, 96, 88, 3), dtype=np.uint8)
    sharded = data_parallel.ShardedStylizer(starry_params, mesh, output_uint8=True)
    out = sharded.stylize_batch(batch)
    assert out.dtype == np.uint8 and out.shape == batch.shape
    ref = np.asarray(Stylizer(params=starry_params, output_uint8=True).stylize_batch(batch))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1  # clip-boundary flips


@pytest.mark.slow
def test_sharded_stylizer_packed_io_matches_single(starry_params):
    """Round-4: packed-u8 I/O (host pack / native host unpack) under
    shard_map matches the single-chip packed path bit-for-bit."""
    from faststyle_tpu.inference import Stylizer

    mesh = mesh_lib.data_mesh()
    rng = np.random.default_rng(6)
    batch = rng.integers(0, 256, (3, 96, 88, 3), dtype=np.uint8)
    sharded = data_parallel.ShardedStylizer(
        starry_params, mesh, packed_input=True, packed_output=True
    )
    out = sharded.stylize_batch(batch)
    assert out.dtype == np.uint8 and out.shape == batch.shape
    single = Stylizer(params=starry_params, packed_input=True, packed_output=True)
    ref = np.stack([single(img) for img in batch])
    np.testing.assert_array_equal(out, ref)
    # the packed path's float->uint8 quantization must warn here too (same
    # contract as the single-chip Stylizer, review r4 weak #6)
    with pytest.warns(UserWarning, match="quantizing to uint8"):
        sharded.stylize_batch(batch.astype(np.float32))


@pytest.mark.slow  # 74 s; the driver runs this exact entry every round anyway
def test_graft_dryrun():
    from faststyle_tpu.parallel import dryrun

    dryrun.run(8)


# ---------------------------------------------------------------------------
# spatially-partitioned single-image inference (parallel/spatial.py)


@pytest.fixture(scope="module")
def starry():
    from faststyle_tpu.inference import load_params
    from pathlib import Path

    return load_params(Path(__file__).parent.parent / "weights" / "starry_final.npz")


def _single(params, img):
    return np.asarray(transform_net.apply(params, jnp.asarray(img)[None], layout="packed"))[0]


@pytest.mark.slow
def test_spatial_matches_single_device(starry):
    """8-way row sharding with psum'd IN stats == single-device forward."""
    from faststyle_tpu.parallel.spatial import SpatialStylizer

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (256, 96, 3)).astype(np.float32)  # 256 = 8*32
    out = SpatialStylizer(starry, mesh_lib.data_mesh())(img)
    np.testing.assert_allclose(out, _single(starry, img), atol=5e-2)


@pytest.mark.slow
def test_spatial_ragged_width(starry):
    from faststyle_tpu.parallel.spatial import SpatialStylizer

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (256, 83, 3)).astype(np.float32)
    out = SpatialStylizer(starry, mesh_lib.data_mesh())(img)
    np.testing.assert_allclose(out, _single(starry, img), atol=5e-2)


@pytest.mark.slow
def test_spatial_halo_floor(starry):
    """The documented contamination bound: halo 16 is exact (the default 24
    carries margin); halo 8 must leak — if it doesn't, the bound analysis
    is stale and DEFAULT_HALO can shrink."""
    from faststyle_tpu.parallel.spatial import SpatialStylizer

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    ref = _single(starry, img)
    ok = SpatialStylizer(starry, mesh_lib.data_mesh(), halo=16)(img)
    np.testing.assert_allclose(ok, ref, atol=5e-2)
    leaky = SpatialStylizer(starry, mesh_lib.data_mesh(), halo=8)(img)
    assert np.abs(leaky - ref).max() > 0.5


@pytest.mark.slow
def test_spatial_auto_shard_reduction(starry):
    """Misaligned heights shard at the largest exact n' instead of
    approximating (4K's 2160 rows -> 6-way on an 8 mesh; prime-ish -> 1)."""
    from faststyle_tpu.parallel.spatial import SpatialStylizer

    s = SpatialStylizer(starry, mesh_lib.data_mesh())
    assert s.shards_for(2160) == 6 and s.shards_for(4320) == 8
    assert s.shards_for(120) == 6
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (120, 64, 3)).astype(np.float32)
    np.testing.assert_allclose(s(img), _single(starry, img), atol=5e-2)
    # no aligned n at all -> exact single-device fallback (any H)
    img2 = rng.uniform(0, 255, (122, 64, 3)).astype(np.float32)
    out2 = s(img2)
    ref2 = _single(starry, img2)
    assert s.shards_for(122) == 1
    np.testing.assert_allclose(out2, ref2, atol=5e-2)


@pytest.mark.slow
def test_spatial_deconv_matches_single_device():
    """Spatial sharding covers 'deconv' models (review r3: it used to
    hard-code the resize phase kernels and crash on deconv weights)."""
    from faststyle_tpu.parallel.spatial import SpatialStylizer

    params = transform_net.init_params(jax.random.PRNGKey(7), "deconv")
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    out = SpatialStylizer(params, mesh_lib.data_mesh(), upsample_method="deconv")(img)
    ref = np.asarray(
        transform_net.apply(
            params, jnp.asarray(img)[None], "deconv", layout="packed"
        )
    )[0]
    np.testing.assert_allclose(out, ref, atol=5e-2)


@pytest.mark.slow
def test_spatial_uint8_consistent_across_shard_choice(starry):
    """uint8 frames must get the same treatment whether the height shards
    (120 -> 6-way) or falls back to single-device (122): both normalize to
    float32 first (review r3: the fallback used to clip+round via the
    uint8-in fast path while the sharded path returned continuous floats)."""
    from faststyle_tpu.parallel.spatial import SpatialStylizer

    s = SpatialStylizer(starry, mesh_lib.data_mesh())
    rng = np.random.default_rng(5)
    for h in (120, 122):  # sharded and fallback
        u8 = rng.integers(0, 256, (h, 64, 3), dtype=np.uint8)
        np.testing.assert_allclose(
            s(u8), s(u8.astype(np.float32)), atol=1e-4,
            err_msg=f"h={h}",
        )
