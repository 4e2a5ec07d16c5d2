"""Transform-net spec tests: shape law, param inventory, golden parity.

Golden oracles are lossless PNGs of a faithful TF re-run of the reference
architecture with the shipped checkpoints (tests/assets/*_tf_oracle.png).
The shipped 2017 JPEGs in the reference's results/ score only ~0.86 SSIM
against even an exact TF re-run (generation-era encoder differences), so the
oracle re-run is the meaningful >=0.99 parity target (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faststyle_tpu.inference import load_params
from faststyle_tpu.models import transform_net
from faststyle_tpu.utils import image_io
from faststyle_tpu.utils.metrics import ssim

from conftest import ASSETS, WEIGHTS


@pytest.mark.parametrize("hw", [(64, 64), (64, 96), (66, 70)])
def test_shape_law(hw):
    """Output spatial size: 4*ceil(ceil((H+80)/2)/2) - 80 == H for H % 4 == 0;
    the pad-40 / VALID-resblock bookkeeping (SURVEY.md §2.3 step 5)."""
    h, w = hw
    params = transform_net.init_params(jax.random.PRNGKey(0))
    out = transform_net.apply(params, jnp.zeros((1, h, w, 3), jnp.float32))

    def law(d):
        return 4 * (-(-(-(-(d + 80) // 2)) // 2)) - 80

    assert out.shape == (1, law(h), law(w), 3)
    if h % 4 == 0 and w % 4 == 0:
        assert out.shape[1:3] == (h, w)


def test_param_count_matches_checkpoint(starry_params):
    """~424K params — cross-checked against the 1,696,408-byte reference
    checkpoint data file (424,102 float32 = 1,696,408 B)."""
    n = transform_net.num_params(starry_params)
    assert n == 1_696_408 // 4


def test_init_params_shapes_match_checkpoint(starry_params):
    fresh = transform_net.init_params(jax.random.PRNGKey(0), "resize")
    ref_shapes = {f"{b}/{v}": a.shape for b, s in starry_params.items() for v, a in s.items()}
    new_shapes = {f"{b}/{v}": tuple(a.shape) for b, s in fresh.items() for v, a in s.items()}
    assert new_shapes == {k: tuple(v) for k, v in ref_shapes.items()}


def test_output_range(starry_params, chicago_crop256):
    x = jnp.asarray(chicago_crop256, jnp.float32)[None]
    out = np.asarray(transform_net.apply(starry_params, x))
    assert out.min() >= 0.0 and out.max() <= 255.0


@pytest.mark.parametrize("model", ["starry", "candy"])
def test_golden_parity_crop256(model, chicago_crop256):
    params = load_params(WEIGHTS / f"{model}_final.npz")
    golden = image_io.imread(ASSETS / f"{model}_crop256_tf_oracle.png")
    x = jnp.asarray(chicago_crop256, jnp.float32)[None]
    out = np.asarray(transform_net.apply(params, x))[0]
    score = ssim(np.clip(out, 0, 255), golden)
    assert score >= 0.99, f"SSIM {score}"


@pytest.mark.slow
def test_golden_parity_512_packed_path(starry_params):
    """BASELINE config #0 shape (512px); 512 % 8 == 0 so this runs the packed
    fast path end to end against the TF oracle."""
    golden = image_io.imread(ASSETS / "starry_512_tf_oracle.png")
    x = jnp.asarray(image_io.imread(ASSETS / "chicago_512.png"), jnp.float32)[None]
    out = np.asarray(transform_net.apply(starry_params, x))[0]
    score = ssim(np.clip(out, 0, 255), golden)
    assert score >= 0.99, f"SSIM {score}"


@pytest.mark.parametrize("model", ["starry", "candy"])
@pytest.mark.slow
def test_golden_parity_native_size_ragged(model):
    """chicago.jpg at its native 474x712 (H % 4 != 0): the ragged packed path
    must reproduce the TF geometry (476-row output) and the TF pixels. This is
    the newest, riskiest path — pin the PERF.md SSIM claim as a test."""
    params = load_params(WEIGHTS / f"{model}_final.npz")
    golden = image_io.imread(ASSETS / f"{model}_chicago_tf_oracle.png")
    x = jnp.asarray(image_io.imread(ASSETS / "chicago.jpg"), jnp.float32)[None]
    out = np.asarray(transform_net.apply(params, x, layout="packed"))[0]
    assert out.shape == golden.shape, (out.shape, golden.shape)
    score = ssim(np.clip(out, 0, 255), golden)
    assert score >= 0.99, f"SSIM {score}"


@pytest.mark.parametrize(
    "hw,batch",
    [
        # fast lane keeps one even and one ragged/odd representative (~15 s
        # each on the CPU mesh); the rest run in the full lane.
        ((64, 64), 2),
        pytest.param((88, 96), 4, marks=pytest.mark.slow),
        pytest.param((128, 72), 2, marks=pytest.mark.slow),
        pytest.param((66, 70), 2, marks=pytest.mark.slow),
        ((59, 83), 4),
        pytest.param((50, 47), 2, marks=pytest.mark.slow),
    ],
)
def test_packed_matches_naive(starry_params, hw, batch):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (batch, *hw, 3)), jnp.float32)
    naive = np.asarray(transform_net.apply(starry_params, x, layout="naive"))
    fast = np.asarray(transform_net.apply(starry_params, x, layout="packed"))
    np.testing.assert_allclose(fast, naive, atol=5e-2)  # [0,255] scale


@pytest.mark.slow
def test_packed_ragged_constant_input_stays_finite(starry_params):
    """Near-constant high-magnitude frames at ragged sizes stress the masked
    instance-norm variance (a one-pass E[x^2]-mu^2 form could cancel below
    -eps and NaN through rsqrt; the masked two-pass form must not)."""
    for value in (0.0, 255.0, 200.0):
        x = jnp.full((1, 59, 83, 3), value, jnp.float32)
        out = np.asarray(transform_net.apply(starry_params, x, layout="packed"))
        assert np.isfinite(out).all(), f"non-finite output for constant {value}"


def test_masked_instance_norm_matches_naive_on_ragged(rng):
    from faststyle_tpu.ops import layers as L
    from faststyle_tpu.ops import packed as PK

    x = (rng.standard_normal((1, 11, 13, 4)) * 30 + 150).astype(np.float32)
    scale = rng.standard_normal(4).astype(np.float32)
    shift = rng.standard_normal(4).astype(np.float32)
    ref = np.asarray(L.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift)))
    packed = PK.pad_pack(jnp.asarray(x), 2)
    got = PK.instance_norm_packed(packed, jnp.asarray(scale), jnp.asarray(shift), 2, valid_hw=(11, 13))
    got = np.asarray(PK.unpack_nhwc(got, 2, 4))[:, :11, :13, :]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_masked_in_and_zero_tail_grouped_pos_map(rng):
    """The pos_map generalization (round 5): masked IN and zero_tail on a
    GROUPED-order tensor (upsample_0's (dy,dx,(py,px,c)) layout) must equal
    the standard-order results after permuting the position groups — fwd,
    input cotangent, and tail re-zeroing alike."""
    from faststyle_tpu.ops import packed as PK

    p, c = 4, 5
    pos_map = transform_net._GROUPED_POS4
    # perm[g] = standard group index of grouped group g
    perm = np.array([fy * p + fx for fy, fx in pos_map])
    lh, lw = 10, 13  # ragged on both axes (3x4 blocks cover 12 x 16)
    x = (rng.standard_normal((1, 3, 4, p * p, c)) * 20 + 100).astype(np.float32)
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    def flat(t):
        return jnp.asarray(t.reshape(1, 3, 4, p * p * c))

    # zero the garbage tails per the caller contract, in standard order
    x_std = np.asarray(
        PK.zero_tail(flat(x), p, c, lh, lw)
    ).reshape(1, 3, 4, p * p, c)
    x_grp = x_std[:, :, :, perm, :]

    def run(t, pm):
        return PK.instance_norm_packed(flat(t), scale, shift, p, valid_hw=(lh, lw), pos_map=pm)

    out_std = np.asarray(run(x_std, None)).reshape(1, 3, 4, p * p, c)
    out_grp = np.asarray(run(x_grp, pos_map)).reshape(1, 3, 4, p * p, c)
    np.testing.assert_allclose(out_grp, out_std[:, :, :, perm, :], rtol=1e-5, atol=1e-5)

    g_std = np.asarray(
        jax.grad(lambda t: jnp.sum(run(t, None) ** 2))(
            jnp.asarray(x_std)
        )
    ).reshape(1, 3, 4, p * p, c)
    g_grp = np.asarray(
        jax.grad(lambda t: jnp.sum(run(t, pos_map) ** 2))(
            jnp.asarray(x_grp)
        )
    ).reshape(1, 3, 4, p * p, c)
    np.testing.assert_allclose(g_grp, g_std[:, :, :, perm, :], rtol=1e-4, atol=1e-4)

    zt_std = np.asarray(PK.zero_tail(flat(x), p, c, lh, lw)).reshape(1, 3, 4, p * p, c)
    zt_grp = np.asarray(
        PK.zero_tail(flat(x.reshape(1, 3, 4, p * p, c)[:, :, :, perm, :]), p, c, lh, lw, pos_map=pos_map)
    ).reshape(1, 3, 4, p * p, c)
    np.testing.assert_allclose(zt_grp, zt_std[:, :, :, perm, :], atol=0)


def test_packed_ragged_grad_matches_naive(starry_params):
    """Param grads through the RAGGED grouped-order upsample route (masked
    IN with pos_map, custom VJP) must equal the naive path's: the forward is
    an exact relayout, so cotangents agree up to fp reassociation. 26x34
    makes the upsample_0 extents ragged on both axes (14 and 18, % 4 != 0),
    forcing the pos_map branch."""
    x = jnp.asarray(
        np.random.default_rng(7).uniform(0, 255, (1, 26, 34, 3)), jnp.float32
    )

    def loss(params, layout):
        return jnp.mean(transform_net.apply(params, x, layout=layout) ** 2)

    gp = jax.grad(lambda p: loss(p, "packed"))(starry_params)
    gn = jax.grad(lambda p: loss(p, "naive"))(starry_params)
    flat_n = dict(jax.tree_util.tree_leaves_with_path(gn))
    for path, vp in jax.tree_util.tree_leaves_with_path(gp):
        vn = np.asarray(flat_n[path])
        scale = max(1e-6, float(np.abs(vn).max()))
        np.testing.assert_allclose(
            np.asarray(vp), vn, rtol=2e-3, atol=2e-3 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_packed_path_differentiable(starry_params):
    """Training runs the packed path: grads must flow through kernel packing."""
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)), jnp.float32)

    def loss(params):
        return jnp.sum(transform_net.apply(params, x, layout="packed") ** 2)

    grads = jax.grad(loss)(starry_params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_fused_vs_reference_upsample_full_net(starry_params, chicago_crop256):
    x = jnp.asarray(chicago_crop256, jnp.float32)[None]
    fused = np.asarray(transform_net.apply(starry_params, x, fused_upsample=True))
    ref = np.asarray(transform_net.apply(starry_params, x, fused_upsample=False))
    assert ssim(fused[0], ref[0]) >= 0.999


def test_bfloat16_compute_keeps_parity(starry_params, chicago_crop256):
    """bf16 conv stack must stay visually identical (the perf-path precision)."""
    x = jnp.asarray(chicago_crop256, jnp.float32)[None]
    f32 = np.asarray(transform_net.apply(starry_params, x))
    bf16 = np.asarray(transform_net.apply(starry_params, x, compute_dtype=jnp.bfloat16))
    assert ssim(f32[0], bf16[0]) >= 0.98


def test_deconv_variant_runs():
    params = transform_net.init_params(jax.random.PRNGKey(1), "deconv")
    out = transform_net.apply(params, jnp.zeros((1, 32, 32, 3)), upsample_method="deconv")
    assert out.shape == (1, 32, 32, 3)


@pytest.mark.parametrize("layout", ["naive", "packed"])
@pytest.mark.parametrize(
    "oracle,crop",
    [("deconv_crop256_tf_oracle.png", None), ("deconv_ragged_tf_oracle.png", (250, 243))],
)
@pytest.mark.slow
def test_golden_parity_deconv(oracle, crop, layout, chicago_crop256):
    """Full-net deconv parity against a MANUFACTURED TF oracle: the reference
    ships no deconv checkpoint, so tools/make_tf_oracles.py inits one
    (deconv_oracle_net.npz), exports it through compat.tf1_checkpoint, and
    runs it through the literal reference graph (`create_net(X, 'deconv')`,
    /root/reference/im_transf_net.py:57-63). Covers aligned and ragged sizes
    on BOTH execution paths (naive adjoint-conv and packed sub-pixel) —
    previously the deconv path rested on one adjoint identity only."""
    params = load_params(ASSETS / "deconv_oracle_net.npz")
    golden = image_io.imread(ASSETS / oracle)
    img = chicago_crop256 if crop is None else chicago_crop256[: crop[0], : crop[1]]
    x = jnp.asarray(img, jnp.float32)[None]
    out = np.asarray(
        transform_net.apply(params, x, upsample_method="deconv", layout=layout)
    )[0]
    assert out.shape == golden.shape, (out.shape, golden.shape)
    score = ssim(np.clip(out, 0, 255), golden)
    assert score >= 0.99, f"SSIM {score}"


@pytest.mark.parametrize("hw,batch", [((64, 64), 2), ((66, 70), 1), ((59, 83), 2)])
@pytest.mark.slow
def test_packed_deconv_matches_naive(hw, batch):
    """The deconv sub-pixel packed path (deconv_phase_kernel + _G_UP_DECONV +
    adjoint final kernel) must equal the naive transposed-conv path at
    aligned and ragged sizes."""
    params = transform_net.init_params(jax.random.PRNGKey(3), "deconv")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (batch, *hw, 3)), jnp.float32)
    naive = np.asarray(transform_net.apply(params, x, "deconv", layout="naive"))
    fast = np.asarray(transform_net.apply(params, x, "deconv", layout="packed"))
    np.testing.assert_allclose(fast, naive, atol=5e-2)  # [0,255] scale


def test_deconv_fused_matches_adjoint(rng):
    """ops.layers.transposed_conv2d_fused (2x2 phase conv + depth-to-space)
    == transposed_conv2d (dilated adjoint conv), the TF-parity oracle."""
    from faststyle_tpu.ops import layers as L

    for h, w in ((8, 8), (7, 5)):
        x = jnp.asarray(rng.standard_normal((2, h, w, 6)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)  # HWOI
        ref = np.asarray(L.transposed_conv2d(x, k, stride=2))
        got = np.asarray(L.transposed_conv2d_fused(x, k))
        np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("layout", ["packed", "naive"])
@pytest.mark.slow
def test_uint8_io_matches_float_path(starry_params, layout):
    """uint8-in/uint8-out (the streaming contract: cast lands before the
    output relayout on the packed path) must equal the float path's
    clip+cast. 0..255 integers are exact in f32/bf16, so the only tolerated
    drift is truncation-boundary flips from program-level fusion noise."""
    rng = np.random.default_rng(3)
    x8 = jnp.asarray(rng.integers(0, 256, (1, 61, 77, 3), dtype=np.uint8))
    ref = np.asarray(
        transform_net.apply(starry_params, x8.astype(jnp.float32), layout=layout)
    )
    ref = np.clip(ref, 0, 255).astype(np.uint8)
    out = np.asarray(transform_net.apply(starry_params, x8, layout=layout))
    assert out.dtype == np.uint8
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


def test_uint8_io_batched_and_explicit_output_dtype(starry_params):
    rng = np.random.default_rng(4)
    x8 = jnp.asarray(rng.integers(0, 256, (3, 48, 52, 3), dtype=np.uint8))
    out = np.asarray(transform_net.apply(starry_params, x8))
    assert out.dtype == np.uint8 and out.shape == x8.shape
    # float input, explicit uint8 output: exact vs post-hoc clip+cast
    xf = x8.astype(jnp.float32)
    want = np.clip(np.asarray(transform_net.apply(starry_params, xf)), 0, 255)
    got = np.asarray(
        transform_net.apply(starry_params, xf, output_dtype=jnp.uint8)
    )
    np.testing.assert_array_equal(got, want.astype(np.uint8))


@pytest.mark.parametrize(
    "mode",
    [
        # the train step runs 'unroll' — keep it fast; 'direct' is an exposed
        # knob only (docs/PERF.md dead end), full lane covers it.
        pytest.param("direct", marks=pytest.mark.slow),
        "unroll",
    ],
)
def test_batch_modes_match_map(mode, starry_params):
    """Non-default batch modes (perf experiment knobs; 'unroll' is the train
    step's program) must equal the default per-sample map numerically."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0, 255, (3, 48, 40, 3)).astype(np.float32))
    want = transform_net.apply_packed(starry_params, x, batch_mode="map")
    got = transform_net.apply_packed(starry_params, x, batch_mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("method", ["resize", "deconv"])
def test_packed_matches_naive_randomized_sizes(starry_params, method):
    """Seeded-random size fuzz over the packed geometry (both upsample
    variants): the parametrized fixed sizes above pin known edge classes;
    this guards the classes nobody thought to enumerate."""
    rng = np.random.default_rng(20260818)
    params = (
        starry_params
        if method == "resize"
        else transform_net.init_params(jax.random.PRNGKey(11), "deconv")
    )
    for _ in range(3):
        h, w = int(rng.integers(8, 97)), int(rng.integers(8, 97))
        x = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)), jnp.float32)
        naive = np.asarray(transform_net.apply(params, x, method, layout="naive"))
        fast = np.asarray(transform_net.apply(params, x, method, layout="packed"))
        np.testing.assert_allclose(fast, naive, atol=5e-2, err_msg=f"{method} {h}x{w}")
