"""Exact plane-wave J/K builders (FFTDF-equivalent oracle).

In-repo equivalent of PySCF ``FFTDF.get_jk`` at k-points — the slow exact
method the reference benchmarks ISDF against (``/root/reference/
fftisdf.py:442-443``: "FFTDF JK" timing, and the vj/vk error prints at
``:468-473``).  Cost O(nk^2 nao^2 ng log ng) per K build; serves as the
accuracy oracle in tests and the baseline side of bench.py.

Density-matrix convention: dm[k]_{mn} with electron density
    n(r) = (1/nk) sum_k sum_{mn} dm[k]_{mn} phi_{k,m}(r) conj(phi_{k,n}(r)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fftisdf_tpu.linalg.fft import fft3, ifft3
from fftisdf_tpu.linalg.coulomb import get_coulG
from fftisdf_tpu.pw.poisson import pair_potential


def get_j_kpts(cell, dm_kpts, ao_kpts, mesh=None):
    """Hartree matrix vj[k] from AO values ao_kpts (nk, ng, nao)."""
    mesh = cell.mesh if mesh is None else mesh
    nk, ng, nao = ao_kpts.shape
    dm = jnp.asarray(dm_kpts)
    # density on the grid
    n_g = jnp.einsum("kgm,kmn,kgn->g", ao_kpts, dm, ao_kpts.conj()) / nk
    vcoul = ifft3(fft3(n_g, mesh) * get_coulG(cell, mesh=mesh), mesh)
    w = cell.vol / ng
    vj = w * jnp.einsum("kgm,g,kgn->kmn", ao_kpts.conj(), vcoul, ao_kpts)
    return vj


def get_k_kpts(cell, dm_kpts, ao_kpts, kpts, mesh=None, coords=None):
    """Exchange matrix vk[k1] from AO values; exact pairwise Poisson solves."""
    mesh = cell.mesh if mesh is None else mesh
    if coords is None:
        coords = cell.gen_uniform_grids(mesh)
    nk, ng, nao = ao_kpts.shape
    dm = jnp.asarray(dm_kpts)
    kpts = jnp.asarray(kpts)
    w = cell.vol / ng

    vk = jnp.zeros((nk, nao, nao), dtype=ao_kpts.dtype)
    for k1 in range(nk):
        for k2 in range(nk):
            q = kpts[k2] - kpts[k1]
            # pair densities rho_{ml}(g) = conj(phi_{k1,m}) phi_{k2,l}
            rho = (ao_kpts[k1].conj()[:, :, None]
                   * ao_kpts[k2][:, None, :]).reshape(ng, -1)
            v = pair_potential(rho.T, q, coords, cell, mesh).T
            v = v.reshape(ng, nao, nao)
            # u_l(g) = sum_s dm[k2]_{ls} conj(phi_{k2,s}(g))
            u = jnp.einsum("ls,gs->gl", dm[k2], ao_kpts[k2].conj())
            vk = vk.at[k1].add(
                (w / nk) * jnp.einsum("gml,gl,gn->mn", v, u, ao_kpts[k1])
            )
    return vk


def get_jk_kpts(cell, dm_kpts, ao_kpts, kpts, mesh=None, coords=None,
                with_j=True, with_k=True):
    """(vj, vk) exact plane-wave build; either may be None if not requested."""
    vj = get_j_kpts(cell, dm_kpts, ao_kpts, mesh) if with_j else None
    vk = get_k_kpts(cell, dm_kpts, ao_kpts, kpts, mesh, coords) if with_k else None
    return vj, vk
