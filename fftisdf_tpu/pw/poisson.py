"""Periodic Poisson solves for Bloch pair densities.

The exact plane-wave machinery underlying both the oracle ERIs/J/K (PySCF
``FFTDF`` equivalents, which the reference uses as its accuracy oracle at
``/root/reference/fftdf-with-k.py:227``, ``fftisdf.py:442-443``) and the ISDF
``w_q`` construction (``fftisdf.py:113-119``).

A pair density with Bloch momentum q, rho(r) = e^{iq.r} u(r) with u
lattice-periodic, has the periodic Coulomb potential

    V(r) = e^{iq.r} * IFFT[ FFT[rho * e^{-iq.r}] * coulG(q) ](r)

with ``coulG(q)[G] = 4pi/|q+G|^2`` and FFT the unnormalized forward /
1/N-normalized inverse transform (numpy convention).  No volume factor: the
1/N in IFFT supplies the (1/vol)*(vol/N) quadrature of the forward Fourier
coefficients.  Matrix elements then use the real-space quadrature weight
vol/ngrid.
"""
from __future__ import annotations

import jax.numpy as jnp

from fftisdf_tpu.linalg.fft import fft3, ifft3
from fftisdf_tpu.linalg.coulomb import get_coulG


def pair_potential(rho, q, coords, cell, mesh=None, coulG=None):
    """Coulomb potential of Bloch pair densities.

    rho: (..., ngrid) complex, momentum q (3,) vector; coords (ngrid, 3).
    Returns V with the same shape, V(g) per grid point (no quadrature weight).
    """
    mesh = cell.mesh if mesh is None else mesh
    if coulG is None:
        coulG = get_coulG(cell, q=q, mesh=mesh)
    eiqr = jnp.exp(1j * (jnp.asarray(coords) @ jnp.asarray(q)))
    work = fft3(rho * eiqr.conj(), mesh)
    work = work * coulG
    return ifft3(work, mesh) * eiqr
