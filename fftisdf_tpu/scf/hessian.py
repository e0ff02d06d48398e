"""Vibrational analysis: FD-of-analytic-forces Hessian and normal modes.

The nuclear Hessian is assembled by central finite differences of the
*analytic* reverse-mode gradient (scf.grad), with the SCF fully re-converged
at every displaced geometry — the standard semi-numerical scheme (an exact
analytic Hessian would need the coupled-perturbed SCF response, which the
frozen-density Lagrangian deliberately avoids).  One traced gradient jit
serves all 6*natm displacements (scf.grad.make_grad_fn), so the cost is
6*natm warm SCF solves + gradient sweeps.

``frequencies`` mass-weights the Hessian, projects out rigid translations
(exact symmetries of the continuum energy; on the FFT mesh they carry only
the egg-box artifact), and returns harmonic wavenumbers in cm^-1 (negative
values encode imaginary modes).

The reference repository has no second-derivative capability of any kind.
"""
import numpy as np

from fftisdf_tpu.basis.data import ATOMIC_MASS, element_symbol
from fftisdf_tpu.scf import grad as scf_grad
from fftisdf_tpu.scf.optimize import _clone_mf

AMU_TO_ME = 1822.888486209        # electron masses per amu
HARTREE_TO_CM1 = 219474.6313632   # E_h to cm^-1


def kernel(mf, step=1e-3, two_electron="pw", df=None, symmetrize=True):
    """Nuclear Hessian d2E/dR2, shape (3*natm, 3*natm), Ha/bohr^2.

    ``mf`` must be converged at the reference geometry.  Each displaced SCF
    warm-starts from ``mf.dm``.  With ``two_electron='isdf'`` the
    interpolation points of ``df`` stay frozen across displacements
    (consistent FD of one fixed approximant); the displaced SCFs serve J/K
    from the reference-geometry state, an O(step) operator mismatch whose
    density error enters the variational gradient only at O(step^2).
    Returns ``(hess, g0)`` with ``g0`` the analytic gradient at the
    reference geometry.
    """
    assert getattr(mf, "dm", None) is not None and mf.converged
    cell = mf.cell
    x0 = np.asarray(cell.atom_coords(), dtype=np.float64)
    natm = len(x0)
    n = 3 * natm
    grad_fn = scf_grad.make_grad_fn(cell, mf.kpts, two_electron=two_electron,
                                    df=df)

    def grad_at(positions):
        new_cell = cell.copy(
            atom=[(sym, np.asarray(p)) for sym, p in
                  zip(cell.atom_symbols(), positions)]).build()
        new_mf = _clone_mf(mf, new_cell)
        if two_electron == "isdf":
            new_mf.with_df = df  # serve J/K from the frozen-point state
        new_mf.kernel(dm0=mf.dm)
        if not new_mf.converged:
            raise RuntimeError("SCF did not converge at a displaced "
                               "geometry; reduce `step` or loosen conv_tol")
        g, _ = grad_fn(new_mf)
        return np.asarray(g, dtype=np.float64).ravel()

    g0, _ = grad_fn(mf)
    hess = np.empty((n, n))
    for i in range(n):
        dx = np.zeros(n)
        dx[i] = step
        gp = grad_at((x0.ravel() + dx).reshape(-1, 3))
        gm = grad_at((x0.ravel() - dx).reshape(-1, 3))
        hess[i] = (gp - gm) / (2.0 * step)
    if symmetrize:
        hess = 0.5 * (hess + hess.T)
    return hess, np.asarray(g0)


def frequencies(cell, hess, project_translations=True):
    """Harmonic wavenumbers (cm^-1, ascending; negative = imaginary) and
    mass-weighted normal modes from a (3*natm, 3*natm) Hessian."""
    masses = np.array([ATOMIC_MASS[element_symbol(s)] * AMU_TO_ME
                       for s in cell.atom_symbols()])
    minv = 1.0 / np.sqrt(np.repeat(masses, 3))
    hw = hess * minv[:, None] * minv[None, :]
    if project_translations:
        # rigid translations in mass-weighted coordinates
        n = hw.shape[0]
        basis = np.zeros((n, 3))
        sq = np.sqrt(np.repeat(masses, 3))
        for a in range(3):
            basis[a::3, a] = sq[a::3]
        q, _ = np.linalg.qr(basis)
        proj = np.eye(n) - q @ q.T
        hw = proj @ hw @ proj
    ev, modes = np.linalg.eigh(hw)
    wav = np.sign(ev) * np.sqrt(np.abs(ev)) * HARTREE_TO_CM1
    return wav, modes
