"""Analytic nuclear gradients vs finite differences of re-converged SCF.

The gold gate: scf.grad.kernel (one reverse-mode sweep through the whole
native stack — Bloch AOs, FFT kinetic, GTH PSP, Ewald, exact-PW or ISDF
two-electron energy, Pulay term) must match central finite differences of
fully re-converged SCF total energies.  This validates every Hellmann-Feynman
AND Pulay contribution at once; nothing comparable exists in the reference
(numpy/LAPACK pipelines cannot differentiate themselves).
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import integrals, KRHF, KUHF
from fftisdf_tpu.scf import grad as scf_grad
from fftisdf_tpu.isdf import FFTISDF


def he2_cell(dz=0.0, box=8.0, mesh=16):
    shells = [Shell(l=0, exps=np.array([0.8, 0.3]),
                    coeffs=np.array([[0.4], [0.7]]))]
    return Cell(
        a=np.diag([box, box, box]),
        atom=[("He", np.array([box / 2, box / 2, box / 2 - 1.25])),
              ("He", np.array([box / 2, box / 2, box / 2 + 1.25 + dz]))],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_ewald_fn_matches_reference():
    cell = he2_cell()
    e = scf_grad.ewald_fn(cell)(np.asarray(cell.atom_coords()))
    np.testing.assert_allclose(float(e), integrals.ewald(cell), atol=1e-10)


def test_energy_fn_reproduces_etot():
    """The Lagrangian at the reference geometry equals the SCF total energy
    (hcore/overlap/2e/Ewald recomputed through the differentiable path)."""
    cell = he2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-11)
    e0 = mf.kernel()
    assert mf.converged
    _, val = scf_grad.kernel(mf, two_electron="pw")
    np.testing.assert_allclose(val, e0, atol=1e-9)


@pytest.mark.slow
def test_forces_vs_finite_difference_rhf():
    """Central-difference gate on the He-He stretch coordinate (exact-PW
    two-electron term; all-electron He, so no projector term)."""
    kmesh = [1, 1, 2]
    mf0 = KRHF(he2_cell(), he2_cell().get_kpts(kmesh), verbose=0,
               conv_tol=1e-12)
    mf0.kernel()
    assert mf0.converged
    g, _ = scf_grad.kernel(mf0, two_electron="pw")

    h = 2e-3
    es = []
    for s in (+1, -1):
        cell = he2_cell(dz=s * h)
        mf = KRHF(cell, cell.get_kpts(kmesh), verbose=0, conv_tol=1e-12)
        es.append(mf.kernel())
        assert mf.converged
    fd = (es[0] - es[1]) / (2 * h)
    np.testing.assert_allclose(g[1, 2], fd, atol=5e-7)
    # Newton's third law on the pair (egg-box error bounded by the grid)
    np.testing.assert_allclose(g[0, 2], -g[1, 2], atol=5e-6)
    np.testing.assert_allclose(g[:, :2], 0.0, atol=5e-7)


@pytest.mark.slow
def test_forces_vs_finite_difference_gth_pseudo():
    """Same gate with GTH pseudopotentials active (local form factors AND
    nonlocal projector Pulay terms), on a compressed diamond cell."""
    def make(dz):
        a, atoms = structure.bulk_diamond()
        atoms = [(s, np.asarray(x)) for s, x in atoms]
        atoms[1] = (atoms[1][0], atoms[1][1] + np.array([0.0, 0.0, dz]))
        return structure.to_cell(a, atoms, basis="gth-szv",
                                 pseudo="gth-pade", ke_cutoff=30.0)

    kmesh = [1, 1, 2]
    cell0 = make(0.05)   # displaced reference: nonzero forces
    mf0 = KRHF(cell0, cell0.get_kpts(kmesh), verbose=0, conv_tol=1e-12)
    mf0.kernel()
    assert mf0.converged
    g, val = scf_grad.kernel(mf0, two_electron="pw")
    np.testing.assert_allclose(val, mf0.e_tot, atol=1e-9)

    h = 2e-3   # displacement in Angstrom (to_cell converts); the analytic
    # gradient is per Bohr, so convert the finite difference
    from fftisdf_tpu.lattice.cell import BOHR
    es = []
    for s in (+1, -1):
        cell = make(0.05 + s * h)
        mf = KRHF(cell, cell.get_kpts(kmesh), verbose=0, conv_tol=1e-12)
        es.append(mf.kernel())
        assert mf.converged
    fd = (es[0] - es[1]) / (2 * h) * BOHR
    np.testing.assert_allclose(g[1, 2], fd, atol=2e-6)


@pytest.mark.slow
def test_isdf_forces_match_pw_at_full_rank():
    """The ISDF-backend gradient (frozen-point approximant) agrees with the
    exact-PW gradient at full-rank compression."""
    cell = he2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    df = FFTISDF(cell, kpts, c0=40.0, m0=(11, 11, 11), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    mf = KRHF(cell, kpts, with_df=df, verbose=0, conv_tol=1e-12)
    mf.kernel()
    assert mf.converged
    g_isdf, v_isdf = scf_grad.kernel(mf, two_electron="isdf", df=df)
    g_pw, v_pw = scf_grad.kernel(mf, two_electron="pw")
    np.testing.assert_allclose(v_isdf, v_pw, atol=1e-8)
    np.testing.assert_allclose(g_isdf, g_pw, atol=1e-6)


def test_forces_uhf_one_electron_vs_fd():
    """1-electron UHF (H atom in a box): the gradient path must run through
    the UHF branch and match finite differences — including the egg-box
    force of the fixed grid (an isolated all-electron atom off a grid plane
    feels an O(1e-4) grid artifact; the analytic gradient of THIS energy
    functional must reproduce it exactly, which is the stronger gate)."""
    def make(z):
        shells = [Shell(l=0, exps=np.array([1.2, 0.45, 0.15]),
                        coeffs=np.array([[0.3], [0.5], [0.4]]))]
        return Cell(
            a=np.diag([9.0, 9.0, 9.0]),
            atom=[("H", np.array([4.5, 4.5, z]))],
            basis={"H": shells},
            pseudo=None,
            mesh=np.array([18] * 3),
            unit="bohr",
            spin=1,
            precision=1e-12,
        ).build()

    kpts = np.zeros((1, 3))
    mf = KUHF(make(4.3), kpts, verbose=0, conv_tol=1e-12)
    mf.kernel()
    assert mf.converged
    g, val = scf_grad.kernel(mf, two_electron="pw")
    np.testing.assert_allclose(val, mf.e_tot, atol=1e-9)
    h = 2e-3
    es = []
    for s in (+1, -1):
        mfs = KUHF(make(4.3 + s * h), kpts, verbose=0, conv_tol=1e-12)
        es.append(mfs.kernel())
        assert mfs.converged
    fd = (es[0] - es[1]) / (2 * h)
    np.testing.assert_allclose(g[0, 2], fd, atol=5e-7)


def test_ks_energy_fn_reproduces_etot():
    """KS Lagrangian value at the reference geometry equals the converged
    KRKS total energy — the pure (hyb=0), hybrid (hyb=0.25), and +U terms
    of the traced functional all assemble to the SCF's own energy."""
    from fftisdf_tpu.scf.ks import KRKS

    cell = he2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    for kw in ({"xc": "lda"}, {"xc": "pbe0"}, {"xc": "scan"},
               {"xc": "lda", "hubbard": {0: (0, 0.3)}}):
        mf = KRKS(cell, kpts, verbose=0, conv_tol=1e-11, **kw)
        e0 = mf.kernel()
        assert mf.converged
        _, val = scf_grad.kernel(mf, two_electron="pw")
        np.testing.assert_allclose(val, e0, atol=1e-9,
                                   err_msg=f"Lagrangian != E_tot for {kw}")


def test_ks_grad_rejects_functional_mismatch():
    from fftisdf_tpu.scf.ks import KRKS

    cell = he2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRKS(cell, kpts, xc="lda", verbose=0, conv_tol=1e-10)
    mf.kernel()
    fn = scf_grad.make_grad_fn(cell, kpts, two_electron="pw", xc="pbe")
    with pytest.raises(ValueError, match="stationary"):
        fn(mf)


@pytest.mark.slow
def test_ks_forces_vs_finite_difference():
    """Central-difference gate for the KS-DFT functional (LDA): the xc
    Pulay force of the traced grid density must be exact."""
    from fftisdf_tpu.scf.ks import KRKS

    kmesh = [1, 1, 2]
    mf0 = KRKS(he2_cell(), he2_cell().get_kpts(kmesh), xc="lda",
               verbose=0, conv_tol=1e-12)
    mf0.kernel()
    assert mf0.converged
    g, val = scf_grad.kernel(mf0, two_electron="pw")
    np.testing.assert_allclose(val, mf0.e_tot, atol=1e-9)

    h = 2e-3
    es = []
    for s in (+1, -1):
        cell = he2_cell(dz=s * h)
        mf = KRKS(cell, cell.get_kpts(kmesh), xc="lda", verbose=0,
                  conv_tol=1e-12)
        es.append(mf.kernel())
        assert mf.converged
    fd = (es[0] - es[1]) / (2 * h)
    np.testing.assert_allclose(g[1, 2], fd, atol=5e-7)
    np.testing.assert_allclose(g[0, 2], -g[1, 2], atol=5e-6)


@pytest.mark.slow
def test_mgga_forces_vs_finite_difference():
    """Central-difference gate for the meta-GGA (SCAN) functional: the
    tau channel's Pulay force — reverse-mode through the Bloch-AO FFT
    gradients — must be exact alongside the rho-channel terms."""
    from fftisdf_tpu.scf.ks import KRKS

    kmesh = [1, 1, 2]
    mf0 = KRKS(he2_cell(), he2_cell().get_kpts(kmesh), xc="scan",
               verbose=0, conv_tol=1e-12)
    mf0.kernel()
    assert mf0.converged
    g, val = scf_grad.kernel(mf0, two_electron="pw")
    np.testing.assert_allclose(val, mf0.e_tot, atol=1e-9)

    h = 2e-3
    es = []
    for s in (+1, -1):
        cell = he2_cell(dz=s * h)
        mf = KRKS(cell, cell.get_kpts(kmesh), xc="scan", verbose=0,
                  conv_tol=1e-12)
        es.append(mf.kernel())
        assert mf.converged
    fd = (es[0] - es[1]) / (2 * h)
    np.testing.assert_allclose(g[1, 2], fd, atol=1e-6)
    np.testing.assert_allclose(g[0, 2], -g[1, 2], atol=5e-6)


@pytest.mark.slow
def test_ks_plus_u_forces_vs_finite_difference():
    """FD gate with DFT+U active: the S(R)^1/2 dependence of the on-site
    occupations (hubbard.sqrtm_traced) is a real Pulay-sized term."""
    from fftisdf_tpu.scf.ks import KRKS

    kmesh = [1, 1, 2]
    spec = {0: (0, 0.3), 1: (0, 0.3)}

    def run(dz):
        cell = he2_cell(dz=dz)
        mf = KRKS(cell, cell.get_kpts(kmesh), xc="lda", hubbard=spec,
                  verbose=0, conv_tol=1e-12)
        mf.kernel()
        assert mf.converged
        return mf

    mf0 = run(0.0)
    g, val = scf_grad.kernel(mf0, two_electron="pw")
    np.testing.assert_allclose(val, mf0.e_tot, atol=1e-9)
    h = 2e-3
    fd = (run(+h).e_tot - run(-h).e_tot) / (2 * h)
    np.testing.assert_allclose(g[1, 2], fd, atol=5e-7)
