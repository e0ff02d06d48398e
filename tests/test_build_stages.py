"""Unit gates for the split build pipeline's spectral / gram stages
(`isdf.kpoint._spectral_inplace`, `_sector_gram`) against a dense oracle.

The integration suites gate the whole build to 1e-10 vs exact plane-wave
ERIs; these tests pin the stage *contracts* the sweep relies on at padded
shapes (ref HOT LOOP 2, /root/reference/fftisdf.py:97-124):

- pad columns ngrid..ngrid_pad (the sweep's ragged-grid tail holds garbage
  AO values at the zero-padded coordinates) are zero-filled by the
  spectral stage, so the gram may contract the full padded width;
- pad rows nip..nip_pad never leak into the [:nip, :nip] metric;
- the four-real-gemm upper-block-triangle gram equals the dense
  M = h h^H metric through `finish_apply` for both solver families.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fftisdf_tpu.isdf import kpoint as K
from fftisdf_tpu.linalg.fft import fft3
from fftisdf_tpu.linalg.solvers import half_factor_data, finish_apply

MESH = (4, 4, 5)
NGRID = 80
NQ, NIP, RBLK, NRB = 2, 13, 8, 2          # nip_pad 16: ragged last slab
NIP_PAD, NGRID_PAD = RBLK * NRB, 96       # ragged grid tail of 16


def _planes_and_phases(seed=7):
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((NQ, NIP_PAD, NGRID_PAD)) \
        + 1j * rng.standard_normal((NQ, NIP_PAD, NGRID_PAD))
    g[:, NIP:, :] = 0.0                   # sweep contract: pad rows zero
    # sweep contract: pad COLUMNS hold garbage (AO values of the
    # zero-padded coordinates) — the spectral stage must zero-fill them
    eiqr = np.exp(1j * rng.standard_normal((NQ, NGRID)))
    sqk = np.abs(rng.standard_normal((NQ, NGRID)))
    return g, eiqr, sqk


def _run_spectral(g, eiqr, sqk):
    out_re, out_im = K._spectral_inplace(
        jnp.asarray(g.real), jnp.asarray(g.imag),
        jnp.asarray(eiqr), jnp.asarray(sqk),
        mesh=MESH, ngrid=NGRID, rblk=RBLK)
    return np.asarray(out_re) + 1j * np.asarray(out_im)


def test_spectral_inplace_vs_dense():
    g, eiqr, sqk = _planes_and_phases()
    h = _run_spectral(g, eiqr, sqk)
    # dense oracle on the live rows/columns
    rows = g[:, :NIP, :NGRID]
    spec = np.asarray(jax.vmap(
        lambda r, p, s: fft3(r * p.conj()[None, :], MESH) * s[None, :])(
        jnp.asarray(rows), jnp.asarray(eiqr), jnp.asarray(sqk)))
    assert np.abs(h[:, :NIP, :NGRID] - spec).max() < 1e-12 * max(
        1.0, np.abs(spec).max())
    # the stage contracts: pad columns zero-filled, pad rows still zero
    assert np.abs(h[:, :, NGRID:]).max() == 0.0
    assert np.abs(h[:, NIP:, :]).max() == 0.0


@pytest.mark.parametrize("solver", ["ridge", "lstsq"])
def test_sector_gram_vs_dense(solver):
    g, eiqr, sqk = _planes_and_phases(seed=11)
    h = _run_spectral(g, eiqr, sqk)
    rng = np.random.default_rng(3)
    b = rng.standard_normal((NIP, NIP)) + 1j * rng.standard_normal((NIP, NIP))
    a = jnp.asarray(b @ b.conj().T + NIP * np.eye(NIP))
    kind, data = half_factor_data(a, method=solver, rcond=1e-12)
    for q in range(NQ):
        w_q, rank_q = K._sector_gram(
            jnp.asarray(h[:, :, :].real), jnp.asarray(h.imag), data,
            q=q, rblk=RBLK, kind=kind)
        m_dense = h[q, :NIP] @ h[q, :NIP].conj().T
        w_ref = finish_apply(kind, data, jnp.asarray(m_dense))
        scale = max(1.0, float(jnp.abs(w_ref).max()))
        assert float(jnp.abs(w_q - w_ref).max()) < 1e-10 * scale
        assert int(rank_q) == int(data[-1])
