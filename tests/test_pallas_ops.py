"""Pallas kernel gates (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.ops.pallas_gram import (
    pair_gram_sq, pair_gram_sq_reference, HAVE_PALLAS)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("square", [False, True])
@pytest.mark.parametrize("shape", [(1, 64, 5), (3, 100, 7), (2, 300, 4),
                                   (16, 96, 40)])  # kk=640: K-blocking path
def test_pair_gram_matches_reference(shape, square):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    x = jnp.asarray(x.astype(np.complex64))
    ref = np.asarray(pair_gram_sq_reference(x, square=square))
    out = np.asarray(pair_gram_sq(x, square=square, tile=64, interpret=True))
    scale = max(abs(ref).max(), 1e-30)
    np.testing.assert_allclose(out, ref, atol=2e-5 * scale)
