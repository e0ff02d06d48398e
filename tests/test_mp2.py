"""KMP2 gates.

- gamma point: matches an independent dense-einsum MP2 implementation built
  from the exact plane-wave ERI tensor and the same orbitals;
- negative (correlation lowers the energy);
- k-mesh consistency: 1x1x2 k-mesh energy/cell equals the gamma-point
  energy/cell of the doubled supercell (the framework's own k-vs-supercell
  duality applied to a correlated method).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf.mp2 import kmp2
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


def dense_mp2_gamma(eri, mo_e, nocc):
    """Independent molecular-style MP2 from a dense MO ERI (mn|kl)."""
    o = slice(None, nocc)
    v = slice(nocc, None)
    eri_iajb = eri[o, v, o, v]
    e = 0.0
    no, nv = eri_iajb.shape[:2]
    for i in range(no):
        for a in range(nv):
            for j in range(no):
                for b in range(nv):
                    d = mo_e[i] - mo_e[nocc + a] + mo_e[j] - mo_e[nocc + b]
                    viajb = eri_iajb[i, a, j, b]
                    vibja = eri_iajb[i, b, j, a]
                    e += (viajb * (2 * np.conj(viajb) - np.conj(vibja)) / d).real
    return e


def test_kmp2_gamma_matches_dense():
    cell = h2_cell()
    kpts = np.zeros((1, 3))
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged

    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    e2, info = kmp2(df, mf)
    assert abs(info["imag"]) < 1e-10

    # dense reference from exact plane-wave MO ERIs + the same orbitals
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))[0]
    c = np.asarray(mf.mo_coeff)[0]
    mo_on_grid = ao @ c
    eri_mo = np.asarray(get_eri_from_ao(
        cell, (jnp.asarray(mo_on_grid),) * 4, np.zeros(3), coords))
    e2_ref = dense_mp2_gamma(eri_mo, np.asarray(mf.mo_energy)[0], 1)
    assert e2 < 0
    np.testing.assert_allclose(e2, e2_ref, atol=1e-6)


@pytest.mark.slow
def test_kmp2_supercell_consistency():
    # 1x1x2 k-mesh on the primitive cell == gamma on the doubled cell, per cell
    cell1 = h2_cell(nz=1)
    kpts2 = cell1.get_kpts([1, 1, 2])
    mf1 = KRHF(cell1, kpts2, verbose=0, conv_tol=1e-10)
    mf1.kernel()
    df1 = FFTISDF(cell1, kpts2, c0=60.0, m0=(11, 11, 13), verbose=0,
                  select_tol=1e-18, rcond=1e-12).build()
    e2_k, _ = kmp2(df1, mf1)

    cell2 = h2_cell(nz=2)
    kpts1 = np.zeros((1, 3))
    mf2 = KRHF(cell2, kpts1, verbose=0, conv_tol=1e-10)
    mf2.kernel()
    df2 = FFTISDF(cell2, kpts1, c0=60.0, m0=(11, 11, 25), verbose=0,
                  select_tol=1e-18, rcond=1e-12).build()
    e2_s, _ = kmp2(df2, mf2)
    np.testing.assert_allclose(e2_k, e2_s / 2, atol=2e-5)


def test_kump2_closed_shell_matches_kmp2():
    """Spin-resolved UMP2 reduces exactly to restricted KMP2 for a
    closed-shell KUHF (identical alpha/beta orbitals)."""
    from fftisdf_tpu.scf import KUHF
    from fftisdf_tpu.scf.mp2 import kump2

    cell = h2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    e2_r, _ = kmp2(df, mf)

    umf = KUHF(cell, kpts, verbose=0, conv_tol=1e-10)
    umf.kernel()
    assert umf.converged
    e2_u, info = kump2(df, umf)
    assert abs(info["imag"]) < 1e-10
    np.testing.assert_allclose(e2_u, e2_r, atol=1e-9)


def test_kump2_spin_polarized_negative():
    """Open-shell (triplet H2 stretch) UMP2: runs through distinct
    alpha/beta occupation counts and lowers the energy."""
    from fftisdf_tpu.scf import KUHF
    from fftisdf_tpu.scf.mp2 import kump2

    cell = h2_cell().copy(spin=2).build()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KUHF(cell, kpts, verbose=0, conv_tol=1e-9, max_cycle=80)
    mf.kernel()
    assert mf.converged
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    e2, info = kump2(df, mf)
    assert info["nocc"] == (2, 0)
    assert abs(info["imag"]) < 1e-10
    assert e2 < 0.0
