"""ISDF-dRPA gates.

- gamma point: the nip-space ring contraction (det(1 - w_q chi_q)) equals
  the explicit ov-pair-space dRPA built from exact plane-wave MO ERIs —
  pins every trace/determinant identity and the spin/time-ordering factors;
- negative (correlation lowers the energy);
- k-mesh consistency: 1x1x2 energy/cell == gamma of the doubled supercell
  per cell — pins the 1/nk normalization of the Bloch pair space.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf.rpa import drpa, drpa_ov_space
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.pw import get_eri_from_ao


def h2_cell(nz=1, lz=7.0):
    atoms = []
    for i in range(nz):
        atoms += [("H", (3.0, 3.0, 1.8 + lz * i)),
                  ("H", (3.0, 3.0, 3.2 + lz * i))]
    return Cell(
        a=np.diag([6.0, 6.0, lz * nz]),
        atom=atoms,
        basis={"H": [Shell(l=0, exps=np.array([1.2, 0.4]),
                           coeffs=np.eye(2))]},
        pseudo="gth-pade",
        mesh=np.array([14, 14, int(14 * nz * lz / 6) // 2 * 2 + 1]),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_drpa_gamma_matches_ov_space():
    cell = h2_cell()
    kpts = np.zeros((1, 3))
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged

    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    e_c, info = drpa(df, mf, nw=24)
    assert e_c < 0

    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))[0]
    c = np.asarray(mf.mo_coeff)[0]
    mo_on_grid = ao @ c
    eri_mo = np.asarray(get_eri_from_ao(
        cell, (jnp.asarray(mo_on_grid),) * 4, np.zeros(3), coords))
    nocc = info["nocc"]
    mo_e = np.asarray(mf.mo_energy)[0]
    v_iajb = eri_mo[:nocc, nocc:, :nocc, nocc:]
    e_ref = drpa_ov_space(v_iajb, mo_e[:nocc], mo_e[nocc:], nw=24)
    np.testing.assert_allclose(e_c, e_ref, atol=1e-6)


@pytest.mark.slow
def test_drpa_supercell_consistency():
    cell1 = h2_cell(nz=1)
    kpts2 = cell1.get_kpts([1, 1, 2])
    mf1 = KRHF(cell1, kpts2, verbose=0, conv_tol=1e-10)
    mf1.kernel()
    df1 = FFTISDF(cell1, kpts2, c0=60.0, m0=(11, 11, 13), verbose=0,
                  select_tol=1e-18, rcond=1e-12).build()
    e_k, _ = drpa(df1, mf1, nw=24)

    cell2 = h2_cell(nz=2)
    mf2 = KRHF(cell2, np.zeros((1, 3)), verbose=0, conv_tol=1e-10)
    mf2.kernel()
    df2 = FFTISDF(cell2, np.zeros((1, 3)), c0=60.0, m0=(11, 11, 25),
                  verbose=0, select_tol=1e-18, rcond=1e-12).build()
    e_s, _ = drpa(df2, mf2, nw=24)
    np.testing.assert_allclose(e_k, e_s / 2, atol=2e-5)
