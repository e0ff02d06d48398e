"""Gamma-point / global ISDF gates (ref isdf.py capability).

- full-rank pair-density reconstruction at 1e-10 for every k-pair
  (ref isdf.py:85-88 / the commented 1e-5 loop at :54-62),
- full ERI assembly through the global fitting functions vs the exact
  plane-wave oracle at 1e-10 (ref isdf.py:154-164),
- compression error decreases with nip.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.isdf import gamma as g
from fftisdf_tpu.pw import get_eri_from_ao
from fftisdf_tpu.lattice import kpoints as kpt_mod


@pytest.fixture(scope="module")
def setup():
    cell = Cell(
        a=np.diag([4.0, 4.0, 6.0]),
        atom=[("He", (2.0, 2.0, 2.0)), ("He", (2.0, 2.0, 4.0))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([9, 9, 11]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts([1, 1, 2])
    coords = cell.gen_uniform_grids()
    ao = jnp.asarray(np.asarray(eval_ao_kpts(cell, coords, kpts)))
    return cell, kpts, coords, ao


def test_pair_reconstruction_full_rank(setup):
    cell, kpts, coords, ao = setup
    xi, mask, rank = g.fit_gamma(ao)
    nk = ao.shape[0]
    for k1 in range(nk):
        for k2 in range(nk):
            rho_ref = np.einsum("gm,gn->gmn", np.asarray(ao[k1]).conj(),
                                np.asarray(ao[k2]))
            rho_sol = np.asarray(g.reconstruct_pair(xi, mask, ao[k1], ao[k2]))
            assert abs(rho_ref - rho_sol).max() < 1e-10, (k1, k2)


def test_eri_through_global_fit(setup):
    cell, kpts, coords, ao = setup
    xi, mask, rank = g.fit_gamma(ao)
    k2c = kpt_mod.get_kconserv2(cell, kpts)
    k3c = kpt_mod.get_kconserv3(cell, kpts)
    mj = jnp.asarray(mask)
    for (k1, k2, k3) in [(0, 0, 0), (0, 1, 1), (1, 0, 0), (1, 1, 1)]:
        k4 = k3c[k1, k2, k3]
        qv = kpts[k2] - kpts[k1]
        coul = g.coul_q_from_xi(cell, xi, coords, qv)
        x1, x2 = ao[k1][mj], ao[k2][mj]
        x3, x4 = ao[k3][mj], ao[k4][mj]
        eri_sol = np.einsum("IJ,Im,In,Jk,Jl->mnkl", np.asarray(coul),
                            np.asarray(x1).conj(), np.asarray(x2),
                            np.asarray(x3).conj(), np.asarray(x4))
        eri_ref = np.asarray(get_eri_from_ao(
            cell, (ao[k1], ao[k2], ao[k3], ao[k4]), qv, coords))
        assert abs(eri_sol - eri_ref).max() < 1e-10, (k1, k2, k3, k4)


def test_compression_monotone(setup):
    cell, kpts, coords, ao = setup
    rho_ref = np.einsum("gm,gn->gmn", np.asarray(ao[0]).conj(),
                        np.asarray(ao[1]))
    errs = []
    for nip in (4, 8, 16):
        xi, mask, rank = g.fit_gamma(ao, nip=nip)
        rho_sol = np.asarray(g.reconstruct_pair(xi, mask, ao[0], ao[1]))
        errs.append(abs(rho_ref - rho_sol).max())
    assert errs[-1] < errs[0]
    assert errs[-1] < 1e-6
