"""Custom-VJP exactness: the packed-kernel and packed-IN backward passes
must match pure autodiff of their straight-line implementations.

Both ops carry hand-written VJPs for speed (the gather's autodiff transpose
is a TPU scatter-add; the IN-statistics graph re-materializes several
temporaries) — measured together they cut the b4@256 net fwd+bwd from 11.4
to 6.2 ms on v5e. These tests pin that the fast backward is the SAME math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from faststyle_tpu.models import transform_net
from faststyle_tpu.ops import packed as PK


@pytest.mark.parametrize(
    "gh,gw,k,ci,co",
    [
        (PK.axis_geom(4, 4, 1, 9, 4), PK.axis_geom(4, 4, 1, 9, 4), 9, 3, 16),
        (PK.axis_geom(2, 2, 1, 3, 0), PK.axis_geom(2, 2, 1, 3, 0), 3, 64, 64),
        (PK.axis_geom(4, 2, 2, 3, 0), PK.axis_geom(4, 2, 2, 3, 1), 3, 16, 32),
        (PK.axis_geom(2, 2, 1, 2, 0), PK.axis_geom(2, 2, 1, 2, 0), 2, 64, 128),
    ],
)
def test_pack_kernel_vjp_matches_autodiff(gh, gw, k, ci, co):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, k, ci, co)), jnp.float32)
    ct = jnp.asarray(
        rng.standard_normal(PK._pack_kernel_fwd_impl(w, gh, gw).shape), jnp.float32
    )
    np.testing.assert_array_equal(
        PK.pack_kernel(w, gh, gw), PK._pack_kernel_fwd_impl(w, gh, gw)
    )
    _, vjp_auto = jax.vjp(lambda ww: PK._pack_kernel_fwd_impl(ww, gh, gw), w)
    _, vjp_cust = jax.vjp(lambda ww: PK.pack_kernel(ww, gh, gw), w)
    np.testing.assert_allclose(vjp_cust(ct)[0], vjp_auto(ct)[0], rtol=1e-6, atol=1e-5)


def _ref_instance_norm(x_packed, scale, shift, p, eps=1e-3, valid_hw=None):
    """Straight-line (autodiff-able) copy of the packed-IN forward math."""
    n, hp, wp, cc = x_packed.shape
    c = cc // (p * p)
    xf = x_packed.astype(jnp.float32).reshape(n, hp, wp, p * p, c)
    if valid_hw is None or tuple(valid_hw) == (hp * p, wp * p):
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
    else:
        lh, lw = valid_hw
        count = jnp.float32(lh * lw)
        mean = jnp.sum(xf, axis=(1, 2, 3), keepdims=True) / count
        row_valid = (np.arange(hp * p) < lh).reshape(hp, p)
        col_valid = (np.arange(wp * p) < lw).reshape(wp, p)
        mask = (row_valid[:, None, :, None] & col_valid[None, :, None, :]).astype(np.float32)
        mask = jnp.asarray(mask.reshape(1, hp, wp, p * p, 1))
        var = jnp.sum(jnp.square(xf - mean * mask), axis=(1, 2, 3), keepdims=True) / count
    normed = (xf - mean) * lax.rsqrt(var + eps)
    out = scale.astype(jnp.float32) * normed + shift.astype(jnp.float32)
    return out.reshape(n, hp, wp, cc).astype(x_packed.dtype)


# valid_hw must satisfy the zero-tail contract: ceil(l/p) == packed blocks
@pytest.mark.parametrize(
    "p,hp,wp,c,valid_hw",
    [(2, 8, 8, 16, None), (4, 6, 5, 8, None), (2, 8, 8, 16, (15, 15)), (4, 6, 5, 8, (21, 18))],
)
def test_instance_norm_vjp_matches_autodiff(p, hp, wp, c, valid_hw):
    rng = np.random.default_rng(0)
    cc = p * p * c
    x = rng.standard_normal((2, hp, wp, cc)).astype(np.float32) * 3 + 1
    if valid_hw is not None:
        x = np.asarray(PK.zero_tail(jnp.asarray(x), p, c, *valid_hw))
    x = jnp.asarray(x)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    shift = jnp.asarray(rng.standard_normal(c), jnp.float32)
    np.testing.assert_allclose(
        PK.instance_norm_packed(x, scale, shift, p, valid_hw=valid_hw),
        _ref_instance_norm(x, scale, shift, p, valid_hw=valid_hw),
        rtol=1e-6,
        atol=1e-5,
    )
    ct = jnp.asarray(rng.standard_normal((2, hp, wp, cc)), jnp.float32)
    if valid_hw is not None:
        ct = PK.zero_tail(ct, p, c, *valid_hw)  # upstream re-zeroing masks tail cts

    g_new = jax.grad(
        lambda *a: jnp.sum(PK.instance_norm_packed(*a, p, valid_hw=valid_hw) * ct),
        argnums=(0, 1, 2),
    )(x, scale, shift)
    g_ref = jax.grad(
        lambda *a: jnp.sum(_ref_instance_norm(*a, p, valid_hw=valid_hw) * ct),
        argnums=(0, 1, 2),
    )(x, scale, shift)
    for got, want in zip(g_new, g_ref):
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_whole_net_grads_match_naive_path():
    """End-to-end: grads of a scalar loss through the packed path (custom
    VJPs + hoisted kernel packing) match grads through the naive lax path."""
    rng = np.random.default_rng(3)
    params = transform_net.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0, 255, (2, 36, 44, 3)), jnp.float32)

    def loss(p, layout):
        y = transform_net.apply(p, x, layout=layout)
        return jnp.mean(jnp.square(y / 255.0))

    g_packed = jax.grad(lambda p: loss(p, "packed"))(params)
    g_naive = jax.grad(lambda p: loss(p, "naive"))(params)
    flat_p = jax.tree_util.tree_leaves_with_path(g_packed)
    flat_n = dict(
        (jax.tree_util.keystr(k), v) for k, v in jax.tree_util.tree_leaves_with_path(g_naive)[0:]
    )
    for key, leaf in flat_p:
        want = flat_n[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(leaf, want, rtol=5e-4, atol=5e-5)
