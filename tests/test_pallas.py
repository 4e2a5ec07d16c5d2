"""Pallas kernels vs their lax oracles (interpret mode on CPU).

The Pallas instance-norm kernel was retired in round 5 (measured slower
than XLA's epilogue fusion at every shape — docs/PERF.md); only the Gram
kernel ships, auto-routed for large feature maps on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faststyle_tpu import losses
from faststyle_tpu.ops.pallas.gram import gram_matrix_pallas


@pytest.mark.parametrize("shape", [(1, 16, 16, 32), (3, 17, 9, 64)])
def test_gram_pallas_matches_lax(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(gram_matrix_pallas(jnp.asarray(x), row_tile=64, interpret=True))
    ref = np.asarray(losses.gram_matrix(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
