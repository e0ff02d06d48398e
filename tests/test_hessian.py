"""Vibrational analysis gates (scf.hessian).

The FD-of-analytic-forces Hessian must be (a) symmetric by construction of
the surface (asymmetry is pure FD noise), (b) consistent with an independent
1D finite difference of the *energy* along the bond coordinate, and (c)
carry near-zero translational modes after mass-weighted projection.  All
three compare quantities computed through entirely different code paths.
"""
import numpy as np

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import hessian as scf_hess

BOX = 8.0
MESH = 14


def h2_cell(d):
    shells = [Shell(l=0, exps=np.array([1.3, 0.25]),
                    coeffs=np.array([[0.5], [0.6]]))]
    return Cell(
        a=np.diag([BOX, BOX, BOX]),
        atom=[("H", np.array([BOX / 2, BOX / 2, BOX / 2 - d / 2])),
              ("H", np.array([BOX / 2, BOX / 2, BOX / 2 + d / 2]))],
        basis={"H": shells},
        pseudo=None,
        mesh=np.array([MESH] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def scf_energy(d):
    cell = h2_cell(d)
    mf = KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-11)
    mf.kernel()
    assert mf.converged
    return mf


def test_isdf_hessian_matches_pw_at_full_rank():
    """Frozen-point ISDF Hessian (displaced SCFs served by the re-fitted
    frozen-mask approximant) equals the exact-PW Hessian at full rank."""
    from fftisdf_tpu.isdf import FFTISDF

    mf = scf_energy(1.30)
    h_pw, _ = scf_hess.kernel(mf, step=1.5e-3)
    df = FFTISDF(mf.cell, mf.kpts, c0=40.0, verbose=0).build()
    h_is, _ = scf_hess.kernel(mf, step=1.5e-3, two_electron="isdf", df=df)
    np.testing.assert_allclose(h_is, h_pw, atol=1e-6)


def test_h2_hessian_and_frequencies():
    d0 = 1.30
    mf = scf_energy(d0)
    hess, g0 = scf_hess.kernel(mf, step=1.5e-3, symmetrize=False)

    # (a) FD of the analytic gradient is symmetric up to FD noise
    asym = np.abs(hess - hess.T).max()
    assert asym < 5e-4 * max(1.0, np.abs(hess).max())
    hess = 0.5 * (hess + hess.T)

    # (b) stretch curvature vs independent energy-only finite differences:
    # d2E/dd2 = v^T H v / 4 with v = d(positions)/dd = (0,0,-1/2, 0,0,+1/2)*2
    v = np.array([0.0, 0.0, -0.5, 0.0, 0.0, 0.5])
    k_hess = float(v @ hess @ v)
    dd = 2e-2
    es = [scf_energy(d0 + i * dd).e_tot for i in (-2, -1, 0, 1, 2)]
    k_fd = (-es[0] + 16 * es[1] - 30 * es[2] + 16 * es[3] - es[4]) / (
        12 * dd * dd)
    # rtol: the two FD windows (1.5e-3 bohr on the gradient vs 2e-2 bohr on
    # the energy) average the egg-box curvature differently — measured
    # ~0.4% at mesh 14; a sign/factor error would be >10%
    np.testing.assert_allclose(k_hess, k_fd, rtol=1e-2, atol=1e-5)
    assert k_hess > 0.1  # a genuinely bound stretch

    # (c) mass-weighted modes: translations project to ~0; one stiff stretch
    wav, _ = scf_hess.frequencies(mf.cell, hess)
    assert np.abs(wav).max() > 1000.0            # stretch, cm^-1
    assert np.sort(np.abs(wav))[:3].max() < 0.05 * np.abs(wav).max()

    # stretch frequency equals the 1D two-body result sqrt(k/mu)
    from fftisdf_tpu.basis.data import ATOMIC_MASS
    mu = ATOMIC_MASS["H"] * scf_hess.AMU_TO_ME / 2.0
    w_1d = np.sqrt(k_hess / mu) * scf_hess.HARTREE_TO_CM1
    np.testing.assert_allclose(np.abs(wav).max(), w_1d, rtol=5e-2)
