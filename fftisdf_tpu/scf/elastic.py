"""Elastic constants from the analytic stress tensor (strain derivatives).

The second-order elastic tensor is assembled by central finite differences
of the ANALYTIC strain gradient (scf.stress, one reverse-mode sweep per
point) with the SCF fully re-converged at every strained lattice — the
strain analog of the FD-of-analytic-forces Hessian (scf.hessian):

    C_IJ = (1/V0) d2E / de_I de_J,    I, J Voigt, engineering shears.

The coordinate subtlety that makes this exact: a second derivative needs
both derivatives taken w.r.t. the SAME strain coordinate eps0
(A = a0 @ (1 + eps0)).  Calling scf.stress at each strained cell would
measure g' = dE/deps' against the *strained* lattice as its own reference
and require the pullback (1 + delta)^{-T} g' — a correction of order the
residual stress, not a small error.  Instead, scf.stress's reusable
cell-gradient evaluator (``make_cell_grad_fn``) parameterizes the energy
by eps0 directly and is traced ONCE at the reference lattice: every
strained point is the same compiled executable evaluated at
``fn(mf_strained, eps=delta)`` with the density re-converged at the
strained cell.  All points share one trace (no per-cell recompilation)
and one coordinate (no pullback), so C_IJ is Maxwell-symmetric by
construction of E(eps0) — which the tests still verify as a cross-gate,
because row I under strain J and row J under strain I come from disjoint
SCF solves.

The strained SCFs themselves run on genuinely deformed cells
(A = a0(1+eps), atoms co-deformed at fixed fractional coordinates, FFT
mesh unchanged — the exact functional the evaluator traces); the
evaluator's Lagrangian value at (delta, dm_delta) must reproduce the
strained SCF's total energy, asserted internally (the image/Ewald lists
are frozen at the reference, so agreement also certifies the strain stayed
inside the frozen-list validity region).

The reference repository has no stress or elasticity capability of any
kind; this extends the derivative stack (scf.grad / scf.stress /
scf.hessian) to second order in strain.
"""
from dataclasses import dataclass, field

import numpy as np

from fftisdf_tpu.scf import stress as scf_stress
from fftisdf_tpu.scf.optimize import _clone_mf

HA_PER_BOHR3_TO_GPA = 29421.02648438959

# Voigt index -> (i, j)
_VOIGT = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]


def voigt_strain(e):
    """(6,) engineering Voigt strain -> symmetric (3,3) strain matrix
    (shears e4..e6 are split half/half off-diagonal)."""
    e = np.asarray(e, dtype=np.float64)
    eps = np.zeros((3, 3))
    for v, (i, j) in enumerate(_VOIGT):
        if i == j:
            eps[i, i] = e[v]
        else:
            eps[i, j] = eps[j, i] = 0.5 * e[v]
    return eps


def stress_to_voigt(s):
    """Symmetric (3,3) stress -> (6,) Voigt vector (no shear factors)."""
    s = np.asarray(s)
    return np.array([s[i, j] for (i, j) in _VOIGT])


def strained_cell(cell, eps):
    """The cell deformed by A = a0 @ (1 + eps) with atoms co-deformed
    (fractional coordinates held fixed) and the FFT mesh UNCHANGED — the
    same functional scf.stress traces, so the analytic strain gradient at
    the strained cell is the exact derivative of the energy being FD'd."""
    f = np.eye(3) + np.asarray(eps, dtype=np.float64)
    atoms = [(sym, np.asarray(xyz, dtype=np.float64) @ f)
             for sym, xyz in cell.atom]
    return cell.copy(a=np.asarray(cell.a, dtype=np.float64) @ f,
                     atom=atoms,
                     mesh=np.asarray(cell.mesh, dtype=np.int64)).build()


@dataclass
class ElasticResult:
    c: np.ndarray            # (6,6) Voigt, Ha/bohr^3; NaN for skipped cols
    sigma0: np.ndarray       # (3,3) reference analytic stress, Ha/bohr^3
    e0: float                # reference total energy (Ha)
    step: float
    components: tuple
    # per computed component J: {"e_plus":..., "e_minus":...} total energies
    # of the strained SCFs (free second-derivative gate: (E+ - 2 E0 + E-)
    # / (step^2 V0) ~= C_JJ)
    energies: dict = field(default_factory=dict)

    @property
    def c_gpa(self):
        return self.c * HA_PER_BOHR3_TO_GPA

    def bulk_modulus_voigt(self):
        c = self.c
        return (c[0, 0] + c[1, 1] + c[2, 2]
                + 2.0 * (c[0, 1] + c[0, 2] + c[1, 2])) / 9.0

    def shear_modulus_voigt(self):
        c = self.c
        return ((c[0, 0] + c[1, 1] + c[2, 2])
                - (c[0, 1] + c[0, 2] + c[1, 2])
                + 3.0 * (c[3, 3] + c[4, 4] + c[5, 5])) / 15.0


def kernel(mf, step=2e-3, components=None, energy_tol=1e-7):
    """Elastic tensor C (6,6) Voigt, Ha/bohr^3, by central FD of the
    analytic strain gradient; ``mf`` must be converged.  Each strained SCF
    warm-starts from ``mf.dm``.  ``components`` restricts the strained
    Voigt directions (default all 6; skipped columns are NaN) — by Maxwell
    symmetry a restricted run still yields the full rows C[I, J] for
    computed J.  ``mf.xc`` / ``mf.hubbard`` / ``mf.exxdiv`` are honored
    (the traced functional is the one each strained density is stationary
    for); exact plane-wave two-electron energy."""
    assert getattr(mf, "dm", None) is not None and mf.converged
    if getattr(mf, "trunc", None) is not None:
        raise NotImplementedError(
            "elastic constants with a truncated Coulomb kernel")
    cell = mf.cell
    vol0 = float(cell.vol)
    comps = tuple(range(6)) if components is None else \
        tuple(int(j) for j in components)

    # ONE evaluator, traced at the reference lattice, serves every strained
    # point at its own eps — shared executable, shared strain coordinate
    fn = scf_stress.make_cell_grad_fn(
        cell, mf.kpts, exxdiv=getattr(mf, "exxdiv", None),
        xc=getattr(mf, "xc", None), hubbard=getattr(mf, "hubbard", None))
    e0, g0, _ = fn(mf)
    sigma0 = 0.5 * (g0 + g0.T) / vol0

    def grad_at(delta_eps):
        ncell = strained_cell(cell, delta_eps)
        nmf = _clone_mf(mf, ncell)
        nmf.kernel(dm0=mf.dm)
        if not nmf.converged:
            raise RuntimeError("SCF did not converge at a strained "
                               "lattice; reduce `step` or loosen conv_tol")
        val, geps, _ = fn(nmf, eps=delta_eps)
        if abs(val - nmf.e_tot) > energy_tol * max(1.0, abs(val)):
            raise RuntimeError(
                f"strain-Lagrangian value {val:.10f} != strained SCF "
                f"energy {nmf.e_tot:.10f}: strain left the frozen "
                "image-list validity region (reduce `step`)")
        return stress_to_voigt(0.5 * (geps + geps.T)) / vol0, float(val)

    c = np.full((6, 6), np.nan)
    energies = {}
    for j in comps:
        e = np.zeros(6)
        e[j] = step
        sp, ep = grad_at(voigt_strain(e))
        sm, em = grad_at(voigt_strain(-e))
        c[:, j] = (sp - sm) / (2.0 * step)
        energies[j] = {"e_plus": ep, "e_minus": em}
    return ElasticResult(c=c, sigma0=np.asarray(sigma0), e0=float(e0),
                         step=float(step), components=comps,
                         energies=energies)
