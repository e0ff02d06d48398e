"""Gamma-point / global ISDF: one q-independent set of fitting functions.

Capability of the reference's ``isdf.py`` (full-grid fit, single fitting
function set shared by all k-point pairs) and the gamma-point slice of
``fftisdf-supercell-{2,3}.py``: given AO values on the grid, select
interpolation points from the full pair-density gram and solve

    zeta[mask, mask] @ xi = zeta[mask, :]        (ref isdf.py:40-52)

where ``zeta[g,h] = |sum_k conj(X_k) X_k^T|^2``-style pair gram.  The fitted
``xi (nip, ngrid)`` reconstructs every AO pair density as
``rho_{k1,k2}(g) ~= sum_I xi_I(g) conj(x_{k1,I,m}) x_{k2,I,n}``
(ref isdf.py:85-88), and ERIs follow by one Poisson solve per q
(ref isdf.py:91-104).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fftisdf_tpu.linalg.pivoted_cholesky import pivoted_cholesky
from fftisdf_tpu.linalg.solvers import solve_fitting
from fftisdf_tpu.pw.poisson import pair_potential


def pair_gram(ao_kpts):
    """zeta[g,h] = |(1/nk) sum_k conj(X_k) X_k^H|^2 elementwise (real).

    ao_kpts: (nk, ng, nao) (a (ng, nao) gamma array is promoted)."""
    if ao_kpts.ndim == 2:
        ao_kpts = ao_kpts[None]
    nk = ao_kpts.shape[0]
    x2 = jnp.einsum("kgm,khm->gh", ao_kpts.conj(), ao_kpts) / nk
    return jnp.abs(x2) ** 2


def fit_gamma(ao_kpts, nip=None, tol=1e-20, rcond=1e-13, solver="lstsq"):
    """Global ISDF fit.  Returns (xi (nip, ng), mask (nip,), rank).

    nip=None keeps every pivot above `tol` (the reference's full-rank
    regime, isdf.py:45-46)."""
    if ao_kpts.ndim == 2:
        ao_kpts = ao_kpts[None]
    zeta = pair_gram(ao_kpts)
    ng = zeta.shape[0]
    max_rank = ng if nip is None else min(int(nip), ng)
    _, piv, rank, hist = pivoted_cholesky(zeta, tol=tol, max_rank=max_rank)
    rank = int(rank)
    n_keep = min(max_rank, rank) if nip is None else min(int(nip), rank)
    mask = np.asarray(piv)[:n_keep]
    mj = jnp.asarray(mask)
    a = zeta[mj][:, mj]
    b = zeta[mj, :]
    xi, _ = solve_fitting(a, b, method=solver, rcond=rcond)
    return xi, mask, rank


def reconstruct_pair(xi, mask, ao1, ao2):
    """rho_sol[g, m, n] = sum_I xi[I, g] conj(ao1[mask][I, m]) ao2[mask][I, n]."""
    x1 = ao1[jnp.asarray(mask)]
    x2 = ao2[jnp.asarray(mask)]
    return jnp.einsum("Ig,Im,In->gmn", xi, x1.conj(), x2)


def coul_q_from_xi(cell, xi, coords, q, mesh=None):
    """coul_q[I,J] = <xi_I | v_coul(q) | xi_J>: the q-sector Coulomb metric of
    the global fitting functions (ref isdf.py:93-104 / fftdf-with-k.py:151-167)."""
    mesh = cell.mesh if mesh is None else mesh
    ng = xi.shape[1]
    v = pair_potential(xi, q, coords, cell, mesh) * (cell.vol / ng)
    return v @ xi.conj().T
