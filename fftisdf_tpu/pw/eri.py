"""Exact plane-wave ERIs for momentum-conserving k-point quadruples.

In-repo oracle equivalent to PySCF ``FFTDF.get_eri`` / ``get_ao_pairs_G``
(the references' accuracy oracles: ``/root/reference/fftdf-with-k.py:227``,
``isdf.py:106-117``).  Cost O(nao^2 ngrid log ngrid) per quadruple — used by
tests and by the benchmark's exact baseline, while ISDF serves the fast path.

Convention: eri[m,n,k,l] = (m k1, n k2 | k k3, l k4)
    = integral conj(phi_{k1,m}) phi_{k2,n} (1/r12) conj(phi_{k3,k}) phi_{k4,l}
with k2 - k1 + k4 - k3 = G (momentum conservation); q = k2 - k1 mod G.
"""
from __future__ import annotations

import jax.numpy as jnp

from fftisdf_tpu.linalg.fft import fft3
from fftisdf_tpu.pw.poisson import pair_potential


def get_ao_pairs_G(ao1, ao2, q, coords, mesh, sign=+1):
    """Fourier transform of the AO pair functions conj(ao1)*ao2.

    Returns (ngrid, nao*nao): FFT[conj(ao1_m) ao2_n e^{-i sign q r}].
    (equivalent of PySCF fft_ao2mo.get_ao_pairs_G, ref isdf.py:106-115)."""
    ng = ao1.shape[0]
    rho = ao1.conj()[:, :, None] * ao2[:, None, :]
    rho = rho.reshape(ng, -1)
    phase = jnp.exp(-1j * sign * (jnp.asarray(coords) @ jnp.asarray(q)))
    return fft3((rho * phase[:, None]).T, mesh).T


def get_eri_from_ao(cell, aos, q, coords=None, mesh=None):
    """Exact ERI tensor (nao,nao,nao,nao) from Bloch AO values.

    aos = (ao1, ao2, ao3, ao4), each (ngrid, nao) at k1..k4 with
    q = k2 - k1 (mod G)."""
    ao1, ao2, ao3, ao4 = aos
    mesh = cell.mesh if mesh is None else mesh
    if coords is None:
        coords = cell.gen_uniform_grids(mesh)
    ng, nao = ao1.shape
    rho12 = (ao1.conj()[:, :, None] * ao2[:, None, :]).reshape(ng, -1)
    v12 = pair_potential(rho12.T, q, coords, cell, mesh).T  # (ng, nao^2)
    rho34 = (ao3.conj()[:, :, None] * ao4[:, None, :]).reshape(ng, -1)
    w = cell.vol / ng
    eri = w * (v12.T @ rho34)
    return eri.reshape(nao, nao, nao, nao)
