"""The ~10-test on-TPU gate: golden parity (f32 AND bf16), packed-vs-naive,
serving-boundary bit-exactness, Pallas-on-Mosaic, and a train-step step — the
claims README/docs make about real-chip behavior, asserted automatically.

SSIM thresholds: f32 carries the same >=0.99 bar as the CPU suite (the TF1
oracle parity contract, SURVEY.md §4); bf16 runs the conv stack in bfloat16
(instance-norm stats stay f32) and lands >=0.98 on these oracles — visually
identical, pinned a hair looser than f32 to cover MXU rounding.

Every forward here goes through ONE jitted program per (shape, dtype,
layout) — the production shape (Stylizer jits exactly like this) AND the
gate's cost model: eager op-by-op execution paid a tunnel round-trip plus a
per-op compile for each of ~50 ops per forward, which is what made the
round-4 gate cost 12-18 min (review r4 weak #3). Whole-program compiles are
also what the persistent compilation cache (conftest) can actually reuse
across bench runs.
"""

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from faststyle_tpu.models import transform_net
from faststyle_tpu.utils import image_io
from faststyle_tpu.utils.metrics import ssim

ASSETS = Path(__file__).resolve().parent.parent / "tests" / "assets"


@functools.partial(jax.jit, static_argnames=("dtype", "layout", "upsample"))
def _fwd(params, x, dtype=None, layout="auto", upsample="resize"):
    return transform_net.apply(
        params, x, upsample, compute_dtype=dtype, layout=layout
    )


def _golden(params, src_name, oracle_name, dtype, threshold):
    golden = image_io.imread(ASSETS / oracle_name)
    x = jnp.asarray(image_io.imread(ASSETS / src_name), jnp.float32)[None]
    out = np.asarray(_fwd(params, x, dtype=dtype))[0]
    score = ssim(np.clip(out, 0, 255), golden)
    assert score >= threshold, f"SSIM {score:.4f} < {threshold} on TPU"


def test_golden_starry_256_f32(starry_params):
    _golden(starry_params, "chicago_crop256.png", "starry_crop256_tf_oracle.png", None, 0.99)


def test_golden_starry_256_bf16(starry_params):
    _golden(
        starry_params, "chicago_crop256.png", "starry_crop256_tf_oracle.png",
        jnp.bfloat16, 0.98,
    )


def test_golden_candy_256_bf16(candy_params):
    _golden(
        candy_params, "chicago_crop256.png", "candy_crop256_tf_oracle.png",
        jnp.bfloat16, 0.98,
    )


def test_golden_starry_512_bf16(starry_params):
    _golden(
        starry_params, "chicago_512.png", "starry_512_tf_oracle.png",
        jnp.bfloat16, 0.98,
    )


def test_packed_matches_naive_on_tpu(starry_params):
    """The packed space-to-depth walk matches the naive path on real-chip
    numerics. Exactness of the relayout semantics is CPU CI's job (tests/
    test_transform_net.py, atol 8e-2); here the TPU lowers f32 convs to
    bf16 MXU passes by default, and the two layouts reassociate those
    differently — measured divergence is ~1.5 counts on the [0,255] scale
    through 13 conv layers. atol=4.0 still trips on any layout/indexing bug:
    misrouted phases produce structural errors at O(50-200) counts."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (1, 96, 88, 3)), jnp.float32)
    naive = np.asarray(_fwd(starry_params, x, layout="naive"))
    fast = np.asarray(_fwd(starry_params, x, layout="packed"))
    np.testing.assert_allclose(fast, naive, atol=4.0)  # [0,255] scale


def test_packed_matches_naive_highest_precision(starry_params):
    """Same comparison with the MXU pinned to full-f32 accumulation
    (jax.default_matmul_precision('highest') — no layer sets an explicit
    precision, so the context governs every conv). This removes the bf16
    reassociation slack that forces the default-lowering test above to
    atol=4.0, so a TPU-backend-specific layout/tiling miscompile that only
    perturbs by a few counts CANNOT hide in the tolerance (review r4): with
    both layouts accumulating in f32, residual divergence is reassociation
    at f32 epsilon, orders below 0.5 on the [0,255] scale."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (1, 96, 88, 3)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        # the precision config is part of jit's trace context, so these are
        # distinct compiled programs from the default-precision test above
        naive = np.asarray(_fwd(starry_params, x, layout="naive"))
        fast = np.asarray(_fwd(starry_params, x, layout="packed"))
    np.testing.assert_allclose(fast, naive, atol=0.5)  # [0,255] scale


def test_uint8_io_matches_float_path(starry_params):
    """output_uint8 (on-device clip+cast before the relayout) equals the
    float output clipped+rounded on host. These are two separately-compiled
    programs; on TPU the default bf16 conv lowering lets their pre-rounding
    floats drift ~1 count apart, so the quantization boundary can land 2
    counts off (observed max 2; CPU agrees within the 1-count rounding tie).
    A wrong clip/scale/boundary produces O(100)-count errors, so <=3 still
    gates."""
    from faststyle_tpu.inference import Stylizer

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (1, 96, 88, 3), dtype=np.uint8)
    u8 = np.asarray(
        Stylizer(params=starry_params, output_uint8=True).stylize_batch(img)
    )
    f32 = np.asarray(
        Stylizer(params=starry_params).stylize_batch(img.astype(np.float32))
    )
    ref = np.clip(np.round(f32), 0, 255).astype(np.uint8)
    assert u8.dtype == np.uint8
    assert np.abs(u8.astype(int) - ref.astype(int)).max() <= 3


def test_packed_u8_io_bit_exact(starry_params):
    """packed_input+packed_output serving (host pack / native host unpack,
    device pure packed compute) is bit-exact vs the plain uint8 path."""
    from faststyle_tpu.inference import Stylizer

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (96, 88, 3), dtype=np.uint8)
    plain = Stylizer(params=starry_params, output_uint8=True)(img)
    packed = Stylizer(params=starry_params, packed_input=True, packed_output=True)(img)
    np.testing.assert_array_equal(plain, packed)


def test_pallas_gram_on_mosaic():
    """The Pallas Gram kernel compiled by Mosaic (NOT interpret mode — the
    CPU suite can only interpret) matches the einsum reference, fwd and bwd."""
    from faststyle_tpu import losses
    from faststyle_tpu.ops.pallas.gram import gram_matrix_pallas

    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((2, 128, 136, 64)), jnp.float32)
    ref = np.asarray(losses.gram_matrix(feats))
    out = np.asarray(jax.jit(gram_matrix_pallas)(feats))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)

    def loss_p(f):
        return jnp.sum(gram_matrix_pallas(f) ** 2)

    def loss_r(f):
        return jnp.sum(losses.gram_matrix(f) ** 2)

    gp = np.asarray(jax.jit(jax.grad(loss_p))(feats))
    gr = np.asarray(jax.jit(jax.grad(loss_r))(feats))
    np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-6)


def test_deconv_oracle_parity(starry_params):
    """The deconv upsample variant's packed phase decomposition against the
    manufactured TF reference-graph oracle, on real-chip numerics."""
    from faststyle_tpu.inference import load_params

    params = load_params(ASSETS / "deconv_oracle_net.npz")
    golden = image_io.imread(ASSETS / "deconv_crop256_tf_oracle.png")
    x = jnp.asarray(image_io.imread(ASSETS / "chicago_crop256.png"), jnp.float32)[None]
    out = np.asarray(_fwd(params, x, layout="packed", upsample="deconv"))[0]
    score = ssim(np.clip(out, 0, 255), golden)
    assert score >= 0.99, f"SSIM {score:.4f}"


def test_train_step_bf16_finite():
    """One jitted perceptual train step (bf16, reference recipe layers) on
    the chip: finite loss, finite param update."""
    from faststyle_tpu.models import vgg16
    from faststyle_tpu.training import slow_style
    from faststyle_tpu.training.train_step import (
        TrainConfig,
        init_state,
        make_jitted_train_step,
    )

    config = TrainConfig.make(compute_dtype=jnp.bfloat16)
    vgg_params = vgg16.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    style = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    grams = slow_style.style_target_grams(
        vgg_params, style, tuple(dict(config.style_weights))
    )
    step = make_jitted_train_step(vgg_params, grams, config)
    state = init_state(jax.random.PRNGKey(1), config)
    batch = jax.device_put(rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert all(np.isfinite(np.asarray(p)).all() for p in jax.tree.leaves(state.params))
