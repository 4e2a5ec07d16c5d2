"""Pallas kernels vs their lax oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faststyle_tpu import losses
from faststyle_tpu.ops import layers as L
from faststyle_tpu.ops import packed as PK
from faststyle_tpu.ops.pallas.gram import gram_matrix_pallas
from faststyle_tpu.ops.pallas.instance_norm import instance_norm_pallas


def test_instance_norm_pallas_matches_lax(rng):
    x = (rng.standard_normal((2, 40, 24, 16)) * 50 + 100).astype(np.float32)
    scale = rng.standard_normal(16).astype(np.float32)
    shift = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(
        instance_norm_pallas(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift),
                             row_chunk=16, interpret=True)
    )
    ref = np.asarray(L.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_instance_norm_pallas_relu_and_ragged_rows(rng):
    x = (rng.standard_normal((1, 37, 10, 8)) * 20 + 5).astype(np.float32)
    scale = np.ones(8, np.float32)
    shift = np.zeros(8, np.float32)
    got = np.asarray(
        instance_norm_pallas(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift),
                             relu=True, row_chunk=16, interpret=True)
    )
    ref = np.asarray(L.relu(L.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift))))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    assert got.min() >= 0


def test_instance_norm_pallas_grouped_matches_packed(rng):
    """groups=p*p folds packed-position stats per real channel."""
    p, c = 2, 8
    x = (rng.standard_normal((2, 12, 14, p * p * c)) * 30 + 60).astype(np.float32)
    scale = rng.standard_normal(c).astype(np.float32)
    shift = rng.standard_normal(c).astype(np.float32)
    got = np.asarray(
        instance_norm_pallas(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift),
                             groups=p * p, row_chunk=8, interpret=True)
    )
    ref = np.asarray(
        PK.instance_norm_packed(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(shift), p)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("shape", [(1, 16, 16, 32), (3, 17, 9, 64)])
def test_gram_pallas_matches_lax(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(gram_matrix_pallas(jnp.asarray(x), row_tile=64, interpret=True))
    ref = np.asarray(losses.gram_matrix(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
