"""Analytic stress tensor vs finite differences of strained, re-converged SCF.

The strain analog of tests/test_forces.py: sigma = (1/V) dL/deps must track
central finite differences of the total energy of cells rebuilt at
A = a0 @ (1 + eps) (atoms at fixed fractional coordinates, SAME FFT mesh —
the discretized surface the stress differentiates), with the SCF fully
re-converged at every strained lattice.  Covers kinetic |G+k|^2, local PSP
form factors, nonlocal projectors, overlap Pulay, Hartree + exchange
Coulomb kernels, and the Ewald sum — all through one reverse-mode sweep.
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import KRHF, KUHF
from fftisdf_tpu.scf import stress as scf_stress


def he2_cell(a_mat=None, box=8.0, mesh=14):
    shells = [Shell(l=0, exps=np.array([0.8, 0.3]),
                    coeffs=np.array([[0.4], [0.7]]))]
    a = np.diag([box, box, box]) if a_mat is None else a_mat
    frac = np.array([[0.5, 0.5, 0.35], [0.5, 0.5, 0.65]])
    return Cell(
        a=a,
        atom=[("He", frac[0] @ a), ("He", frac[1] @ a)],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def scf_he2(a_mat=None, kmesh=(1, 1, 2)):
    cell = he2_cell(a_mat)
    mf = KRHF(cell, cell.get_kpts(list(kmesh)), verbose=0, conv_tol=1e-11)
    mf.kernel()
    assert mf.converged
    return mf


def _fd_strain(make_scf, a0, eps_dir, h=1e-4):
    """Central FD of the re-converged SCF energy along a strain direction."""
    es = []
    for s in (+h, -h):
        A = a0 @ (np.eye(3) + s * eps_dir)
        es.append(make_scf(A).e_tot)
    return (es[0] - es[1]) / (2 * h)


def test_lagrangian_matches_e_tot():
    mf = scf_he2()
    sigma, pressure, val = scf_stress.kernel(mf)
    np.testing.assert_allclose(val, mf.e_tot, atol=1e-9)
    assert sigma.shape == (3, 3)
    np.testing.assert_allclose(sigma, sigma.T, atol=1e-14)


def test_stress_vs_fd_rhf():
    """xx, symmetric xy, and isotropic strain derivatives (all-electron)."""
    mf = scf_he2()
    a0 = np.asarray(mf.cell.a)
    vol = float(mf.cell.vol)
    sigma, pressure, _ = scf_stress.kernel(mf)

    exx = np.zeros((3, 3)); exx[0, 0] = 1.0
    fd_xx = _fd_strain(scf_he2, a0, exx)
    np.testing.assert_allclose(vol * sigma[0, 0], fd_xx,
                               rtol=2e-5, atol=5e-7)

    exy = np.zeros((3, 3)); exy[0, 1] = exy[1, 0] = 1.0
    fd_xy = _fd_strain(scf_he2, a0, exy)
    np.testing.assert_allclose(2 * vol * sigma[0, 1], fd_xy,
                               rtol=2e-5, atol=5e-7)

    fd_iso = _fd_strain(scf_he2, a0, np.eye(3))
    np.testing.assert_allclose(-3.0 * vol * pressure, fd_iso,
                               rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_stress_vs_fd_gth_diamond():
    """GTH diamond: local form factors + nonlocal projectors under strain."""
    base = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    a0 = np.asarray(base.a)
    frac = np.asarray(base.atom_coords()) @ np.linalg.inv(a0)
    mesh0 = np.asarray(base.mesh).copy()
    syms = base.atom_symbols()

    def make_scf(A):
        cell = Cell(a=A, atom=[(s, f @ A) for s, f in zip(syms, frac)],
                    basis="gth-szv", pseudo="gth-pade", mesh=mesh0,
                    unit="bohr", precision=base.precision).build()
        mf = KRHF(cell, cell.get_kpts([1, 1, 2]), verbose=0, conv_tol=1e-11)
        mf.kernel()
        assert mf.converged
        return mf

    mf = make_scf(a0)
    vol = float(mf.cell.vol)
    sigma, pressure, val = scf_stress.kernel(mf)
    np.testing.assert_allclose(val, mf.e_tot, atol=1e-9)

    exx = np.zeros((3, 3)); exx[0, 0] = 1.0
    fd_xx = _fd_strain(make_scf, a0, exx)
    np.testing.assert_allclose(vol * sigma[0, 0], fd_xx,
                               rtol=5e-5, atol=2e-6)

    fd_iso = _fd_strain(make_scf, a0, np.eye(3))
    np.testing.assert_allclose(-3.0 * vol * pressure, fd_iso,
                               rtol=5e-5, atol=5e-6)


def test_isdf_stress_matches_pw_at_full_rank():
    """The frozen-point ISDF-backend stress equals the exact-PW stress when
    the fit is full-rank (the strain analog of the force gate in
    test_forces.py; measured 1.4e-9)."""
    from fftisdf_tpu.isdf import FFTISDF

    mf = scf_he2()
    s_pw, p_pw, _ = scf_stress.kernel(mf)
    df = FFTISDF(mf.cell, mf.kpts, c0=40.0, verbose=0).build()
    s_is, p_is, v_is = scf_stress.kernel(mf, two_electron="isdf", df=df)
    np.testing.assert_allclose(v_is, mf.e_tot, atol=1e-6)
    np.testing.assert_allclose(s_is, s_pw, atol=1e-7)
    np.testing.assert_allclose(p_is, p_pw, atol=1e-7)


@pytest.mark.slow
def test_stress_uhf_matches_rhf_closed_shell():
    """KUHF on a closed-shell system gives the same stress as KRHF."""
    mf_r = scf_he2(kmesh=(1, 1, 2))
    cell = mf_r.cell
    mf_u = KUHF(cell, cell.get_kpts([1, 1, 2]), verbose=0, conv_tol=1e-11)
    mf_u.kernel()
    assert mf_u.converged
    s_r, p_r, _ = scf_stress.kernel(mf_r)
    s_u, p_u, _ = scf_stress.kernel(mf_u)
    np.testing.assert_allclose(s_u, s_r, atol=1e-8)
    np.testing.assert_allclose(p_u, p_r, atol=1e-8)


def test_ks_stress_vs_fd():
    """KS-DFT (PBE) stress: the grid Exc with strained quadrature weight
    and G-vectors (the GGA gradient term's strain) must match central
    finite differences of re-converged KRKS energies; the pairwise
    Poisson exchange loop is skipped entirely (pure functional)."""
    from fftisdf_tpu.scf.ks import KRKS

    def scf_ks(a_mat=None):
        cell = he2_cell(a_mat)
        mf = KRKS(cell, cell.get_kpts([1, 1, 2]), xc="pbe", verbose=0,
                  conv_tol=1e-11)
        mf.kernel()
        assert mf.converged
        return mf

    mf = scf_ks()
    a0 = np.asarray(mf.cell.a)
    vol = float(mf.cell.vol)
    sigma, pressure, val = scf_stress.kernel(mf)
    np.testing.assert_allclose(val, mf.e_tot, atol=1e-9)

    exx = np.zeros((3, 3)); exx[0, 0] = 1.0
    fd_xx = _fd_strain(scf_ks, a0, exx)
    np.testing.assert_allclose(vol * sigma[0, 0], fd_xx,
                               rtol=2e-5, atol=5e-7)
    fd_iso = _fd_strain(scf_ks, a0, np.eye(3))
    np.testing.assert_allclose(-3.0 * vol * pressure, fd_iso,
                               rtol=2e-5, atol=1e-6)


def test_mgga_stress_vs_fd():
    """Meta-GGA (SCAN) stress: tau's strain dependence — strained
    G-vectors in the FFT AO gradient and the strained k in (grad + ik)u,
    with the k.r phases riding the invariant angle table — must match
    central FD of re-converged energies."""
    from fftisdf_tpu.scf.ks import KRKS

    def scf_ks(a_mat=None):
        cell = he2_cell(a_mat)
        mf = KRKS(cell, cell.get_kpts([1, 1, 2]), xc="scan", verbose=0,
                  conv_tol=1e-11)
        mf.kernel()
        assert mf.converged
        return mf

    mf = scf_ks()
    a0 = np.asarray(mf.cell.a)
    vol = float(mf.cell.vol)
    sigma, pressure, val = scf_stress.kernel(mf)
    np.testing.assert_allclose(val, mf.e_tot, atol=1e-9)

    exx = np.zeros((3, 3)); exx[0, 0] = 1.0
    fd_xx = _fd_strain(scf_ks, a0, exx)
    np.testing.assert_allclose(vol * sigma[0, 0], fd_xx,
                               rtol=2e-5, atol=1e-6)


def test_ks_plus_u_stress_lagrangian_matches_e_tot():
    """+U stress path smoke: the strained-overlap S^1/2 term assembles to
    the SCF energy at eps=0 (its strain derivative shares the FD-gated
    sqrtm machinery with the force test)."""
    from fftisdf_tpu.scf.ks import KRKS

    cell = he2_cell()
    mf = KRKS(cell, cell.get_kpts([1, 1, 2]), xc="lda",
              hubbard={0: (0, 0.3)}, verbose=0, conv_tol=1e-11)
    mf.kernel()
    assert mf.converged
    _sigma, _p, val = scf_stress.kernel(mf)
    np.testing.assert_allclose(val, mf.e_tot, atol=1e-9)
