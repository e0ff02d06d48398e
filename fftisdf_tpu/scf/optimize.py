"""Geometry optimization on the analytic nuclear gradients.

BFGS on the flattened Cartesian coordinates with a trust-radius step cap;
each step fully re-converges the SCF at the displaced geometry (warm-started
from the previous density matrix) and takes the force from one reverse-mode
sweep through the whole stack (``scf.grad``).  Because the gradient tracks
the *discretized* energy surface (egg-box included, see docs/THEORY.md §8),
the optimizer descends the same surface the SCF evaluates — no force/energy
inconsistency, which is what makes quasi-Newton steps reliable here.

The reference (`/root/reference/fftisdf.py` and friends) is single-point
only — it has no forces and no relaxation capability; this module is the
downstream consumer its SCF energies point at.

Net translations are projected out of every step: a rigid translation is an
exact symmetry of the continuum energy and only the egg-box artifact breaks
it on the mesh, so following it would drift the system without physical
gain.
"""
from dataclasses import dataclass, field

import numpy as np

from fftisdf_tpu.scf import grad as scf_grad
from fftisdf_tpu.utils.logging import Logger


@dataclass
class OptResult:
    converged: bool
    positions: np.ndarray          # (natm, 3) bohr, final geometry
    energy: float                  # final total energy (Ha)
    grad: np.ndarray               # (natm, 3) final gradient (Ha/bohr)
    mf: object                     # converged SCF at the final geometry
    trajectory: list = field(default_factory=list)  # [(positions, e, fmax)]
    nsteps: int = 0


_CLONE_SKIP = {
    # positional / replaced
    "cell", "kpts", "with_df",
    # SCF outputs (overwritten by kernel(), but copying them would make the
    # clone look converged before it runs)
    "e_tot", "e_free", "entropy", "mu", "mo_energy", "mo_coeff", "mo_occ",
    "converged",
}


def _clone_mf(mf, cell, kpts=None):
    """A fresh SCF object at a displaced geometry, same knobs as ``mf``.

    Copies every dataclass init field (so KUHF-only knobs like init_spin /
    spin bias survive) except the geometry, the J/K provider, and the SCF
    outputs."""
    import dataclasses

    kw = {f.name: getattr(mf, f.name)
          for f in dataclasses.fields(type(mf))
          if f.init and f.name not in _CLONE_SKIP}
    kw["verbose"] = 0
    return type(mf)(cell, mf.kpts if kpts is None else kpts, **kw)


class BOForceField:
    """Born-Oppenheimer force evaluator reused by every geometry-sweeping
    driver (relaxation, molecular dynamics, finite-difference Hessians).

    Calling it with a geometry fully re-converges the SCF there (warm-
    started from ``dm0``) and takes the analytic gradient from one
    reverse-mode sweep (``scf.grad``): ``ff(positions, dm0) ->
    (mf, energy, grad)``.

    Exact-PW forces reuse ONE traced gradient fn across geometries (the
    frozen image/translation/G lists are exact for sub-cell displacements);
    :meth:`maybe_reanchor` retraces it — with the SAME xc/hubbard/exxdiv
    functional — once the cumulative displacement from the traced reference
    exceeds ``anchor_drift`` bohr.  The ISDF backend re-selects
    interpolation points (and so retraces) per geometry by construction.
    """

    def __init__(self, mf, two_electron="pw", isdf_kwargs=None,
                 anchor_drift=1.0):
        if getattr(mf, "trunc", None) is not None:
            raise NotImplementedError(
                "geometry sweeps with a truncated Coulomb kernel "
                "(forces trace the bare-kernel functional)")
        assert mf.cell._built
        self.mf0 = mf
        self.cell = mf.cell
        self.two_electron = two_electron
        self.isdf_kwargs = isdf_kwargs or {}
        self.anchor_drift = anchor_drift
        self._exxdiv = getattr(mf, "exxdiv", None)
        self._xc = getattr(mf, "xc", None)
        self._hubbard = getattr(mf, "hubbard", None)
        self._anchor = np.asarray(mf.cell.atom_coords(), dtype=np.float64)
        self._pw_grad = (self._trace(mf.cell) if two_electron == "pw"
                         else None)

    def _trace(self, cell):
        return scf_grad.make_grad_fn(cell, self.mf0.kpts, two_electron="pw",
                                     exxdiv=self._exxdiv, xc=self._xc,
                                     hubbard=self._hubbard)

    def eval_converged(self, mf):
        """(energy, grad) of an ALREADY-converged SCF at its own geometry
        (the isdf path requires ``mf.with_df`` to be a built FFTISDF)."""
        if self._pw_grad is not None:
            g, e = self._pw_grad(mf)
        else:
            g, e = scf_grad.kernel(mf, two_electron=self.two_electron,
                                   df=mf.with_df)
        return float(e), np.asarray(g, dtype=np.float64)

    def __call__(self, positions, dm0=None):
        new_cell = self.cell.copy(
            atom=[(sym, np.asarray(p)) for sym, p in
                  zip(self.cell.atom_symbols(), positions)]).build()
        new_mf = _clone_mf(self.mf0, new_cell)
        df = None
        if self.two_electron == "isdf":
            from fftisdf_tpu.isdf import FFTISDF
            from fftisdf_tpu.isdf.kpoint import clear_build_caches

            # fresh cell each step => fresh (static) evaluator identity;
            # evict the previous geometry's compiled build stages so the
            # jit cache stays bounded over a long sweep
            clear_build_caches()
            df = FFTISDF(new_cell, self.mf0.kpts, dtype=self.mf0.dtype,
                         verbose=0, **self.isdf_kwargs).build()
            new_mf.with_df = df
        new_mf.kernel(dm0=dm0)
        if not new_mf.converged:
            raise RuntimeError("SCF failed to converge during the geometry "
                               "sweep; loosen conv_tol or improve the start")
        if self._pw_grad is not None:
            g, e = self._pw_grad(new_mf)
        else:
            g, e = scf_grad.kernel(new_mf, two_electron=self.two_electron,
                                   df=df)
        return new_mf, float(e), np.asarray(g, dtype=np.float64)

    def maybe_reanchor(self, cell, positions):
        """Retrace the frozen-lattice-list gradient fn at ``cell`` if the
        geometry drifted more than ``anchor_drift`` bohr from the traced
        reference.  Returns the drift if it retraced, else None."""
        drift = float(np.abs(np.asarray(positions, dtype=np.float64)
                             - self._anchor).max())
        if self._pw_grad is not None and drift > self.anchor_drift:
            self._pw_grad = self._trace(cell)
            self._anchor = np.asarray(positions, dtype=np.float64).copy()
            return drift
        return None


def kernel(mf, fmax=5e-4, max_steps=50, step_max=0.2, two_electron="pw",
           isdf_kwargs=None, callback=None):
    """Relax the atoms of ``mf.cell`` until ``max|grad| < fmax`` (Ha/bohr).

    ``mf`` may be converged or not (its ``kernel`` is run if needed).  With
    ``two_electron='isdf'`` a fresh ``FFTISDF`` (``isdf_kwargs``: c0, m0,
    solver, ...) is built at every geometry and used for BOTH the SCF J/K
    and the gradient's frozen-point ISDF energy, so forces stay consistent
    with the energy being minimized.  Returns an :class:`OptResult`.
    """
    log = Logger(getattr(mf, "verbose", 3))
    cell = mf.cell
    # the traced functional follows the driver (KS xc / +U included —
    # _clone_mf carries them to every geometry)
    ff = BOForceField(mf, two_electron=two_electron,
                      isdf_kwargs=isdf_kwargs)
    scf_at = ff

    x = np.asarray(cell.atom_coords(), dtype=np.float64).ravel()
    n = x.size

    # seed from the caller's mf if already converged at the start geometry
    # (for the isdf force backend the caller's df must itself be a built
    # FFTISDF — otherwise rebuild through scf_at)
    usable = (getattr(mf, "dm", None) is not None and mf.converged
              and (two_electron != "isdf" or hasattr(mf.with_df, "wq")))
    if usable:
        e, g = ff.eval_converged(mf)
        cur_mf = mf
    else:
        cur_mf, e, g = scf_at(x.reshape(-1, 3), None)

    H = np.eye(n)  # inverse-Hessian estimate (bohr^2/Ha); unit seed + cap
    traj = []
    converged = False
    for step in range(max_steps + 1):
        gv = g - g.mean(axis=0, keepdims=True)  # project out translation
        f_inf = np.abs(gv).max()
        traj.append((x.reshape(-1, 3).copy(), e, float(f_inf)))
        log.info("relax step %d  E=%.10f  max|F|=%.3e", step, e, f_inf)
        if callback is not None:
            callback(step, x.reshape(-1, 3), e, g)
        if f_inf < fmax:
            converged = True
            break
        if step == max_steps:  # out of steps; final iterate checked above
            break

        p = -H @ gv.ravel()
        p = (p.reshape(-1, 3) - p.reshape(-1, 3).mean(axis=0)).ravel()
        pn = np.linalg.norm(p)
        if pn > step_max * np.sqrt(len(p) / 3):
            p *= step_max * np.sqrt(len(p) / 3) / pn
        x_new = x + p
        mf_new, e_new, g_new = scf_at(x_new.reshape(-1, 3),
                                      getattr(cur_mf, "dm", None))
        gv_new = g_new - g_new.mean(axis=0, keepdims=True)

        # backtrack once if the quasi-Newton step overshot badly
        if e_new > e + 1e-12 and np.abs(gv_new).max() > f_inf:
            p *= 0.25
            x_new = x + p
            mf_new, e_new, g_new = scf_at(x_new.reshape(-1, 3),
                                          getattr(cur_mf, "dm", None))
            gv_new = g_new - g_new.mean(axis=0, keepdims=True)

        # BFGS update of the inverse Hessian (curvature-guarded)
        s = x_new - x
        y = (gv_new - gv).ravel()
        sy = float(s @ y)
        if sy > 1e-12:
            rho = 1.0 / sy
            I = np.eye(n)
            V = I - rho * np.outer(s, y)
            H = V @ H @ V.T + rho * np.outer(s, s)
        x, e, g, cur_mf = x_new, e_new, g_new, mf_new

        # frozen image/Ewald lists degrade once the cumulative displacement
        # from the traced reference grows beyond ~a bohr: re-anchor the
        # gradient fn at the current geometry (one retrace)
        drift = ff.maybe_reanchor(cur_mf.cell, x.reshape(-1, 3))
        if drift is not None:
            log.info("relax: re-anchored gradient fn (displacement %.2f "
                     "bohr)", drift)

    return OptResult(converged=converged, positions=x.reshape(-1, 3),
                     energy=e, grad=g, mf=cur_mf, trajectory=traj,
                     nsteps=len(traj) - 1)


@dataclass
class CellOptResult:
    converged: bool
    cell: object                   # final built Cell
    energy: float
    sigma: np.ndarray              # (3,3) final stress (Ha/bohr^3)
    forces_max: float              # final max Cartesian force component
    mf: object
    trajectory: list = field(default_factory=list)  # [(e, max|F|, max|s|)]
    nsteps: int = 0


def relax_cell(mf, fmax=5e-4, smax=2e-5, max_steps=40, step_max=0.1,
               relax_atoms=True, re_anchor=0.04, callback=None):
    """Variable-cell relaxation: BFGS on [strain (6), fractional atoms].

    One traced cell-Lagrangian (scf.stress.make_cell_energy_fn, anchored at
    the starting lattice) yields the stress AND the forces per step in a
    single reverse sweep with no per-geometry recompilation; the SCF is
    fully re-converged at every (eps, dfrac) iterate on the SAME FFT mesh
    (the mesh deforms with the cell — the discretized surface being
    minimized; re-mesh and re-run to polish if the volume changed a lot).
    Converged when max Cartesian force < ``fmax`` (Ha/bohr) and
    max |sigma| < ``smax`` (Ha/bohr^3).  ``relax_atoms=False`` freezes the
    fractional coordinates (cell-only relaxation; the force gate is then
    not applied).

    The anchored Lagrangian is only valid for sub-cell strains (frozen
    image/Ewald lists); whenever the accumulated strain exceeds
    ``re_anchor`` (or displacements exceed 5x ``step_max``) the function is
    RE-ANCHORED at the current cell (one retrace; the BFGS curvature is
    kept — the parametrization shift is second-order in the anchor strain)
    so arbitrarily large total relaxations stay on the true surface.
    """
    from fftisdf_tpu.scf import stress as scf_stress

    log = Logger(getattr(mf, "verbose", 3))
    cell0 = mf.cell
    assert cell0._built
    a0 = np.asarray(cell0.a)
    frac0 = np.asarray(cell0.atom_coords()) @ np.linalg.inv(a0)
    syms = cell0.atom_symbols()
    natm = len(syms)
    # k-points deform WITH the cell (fixed fractional k) — the convention
    # the cell Lagrangian differentiates; feeding the displaced SCF the
    # reference Cartesian kpts would converge a different Hamiltonian and
    # break the stationarity the frozen-D gradient relies on
    kscaled0 = cell0.get_scaled_kpts(np.asarray(mf.kpts))
    mf_exxdiv = getattr(mf, "exxdiv", None)
    mf_xc = getattr(mf, "xc", None)
    mf_hub = getattr(mf, "hubbard", None)
    grad_fn = scf_stress.make_cell_grad_fn(cell0, mf.kpts, dtype=mf.dtype,
                                           exxdiv=mf_exxdiv, xc=mf_xc,
                                           hubbard=mf_hub)

    def scf_at(eps, dfrac, dm0):
        A = a0 @ (np.eye(3) + eps)
        new_cell = cell0.copy(
            a=A, atom=[(s, f @ A) for s, f in zip(syms, frac0 + dfrac)],
        ).build()
        new_mf = _clone_mf(mf, new_cell,
                           kpts=kscaled0 @ new_cell.reciprocal_vectors())
        new_mf.kernel(dm0=dm0)
        if not new_mf.converged:
            raise RuntimeError("SCF failed to converge during cell "
                               "relaxation")
        val, geps, gfrac = grad_fn(new_mf, eps, dfrac)
        return new_mf, new_cell, val, geps, gfrac

    # pack [eps6, dfrac*3natm]; symmetric-strain gradient: off-diagonals of
    # sym(geps) summed (d/deps_xy + d/deps_yx for a symmetric step)
    iu = np.triu_indices(3)

    def pack_grad(geps, gfrac):
        gs = geps + geps.T
        g6 = gs[iu] * np.where(iu[0] == iu[1], 0.5, 1.0)
        return np.concatenate([g6, gfrac.ravel()])

    def unpack(x):
        eps = np.zeros((3, 3))
        eps[iu] = x[:6]
        eps = eps + eps.T - np.diag(np.diag(eps))
        return eps, x[6:].reshape(natm, 3)

    x = np.zeros(6 + 3 * natm)
    cur_mf, cur_cell, e, geps, gfrac = scf_at(*unpack(x), getattr(mf, "dm",
                                                                  None))
    n = x.size
    # seed inverse Hessian with the right scales: strain curvature is
    # O(vol * elastic modulus) — a unit seed would take O(vol*sigma) strain
    # steps; 1/vol makes the first step ~sigma itself
    vol0 = float(cell0.vol)
    H = np.diag(np.concatenate([np.full(6, 1.0 / vol0),
                                np.ones(3 * natm)]))
    eps_cap = 0.02  # per-step strain cap (image lists frozen at reference)
    traj = []
    converged = False
    for step in range(max_steps + 1):
        eps, dfrac = unpack(x)
        A = a0 @ (np.eye(3) + eps)
        vol = float(abs(np.linalg.det(A)))
        sigma = 0.5 * (geps + geps.T) / vol
        # Cartesian forces from the dfrac gradient (rows: g_cart = gfrac A^-T)
        g_cart = gfrac @ np.linalg.inv(A).T
        g_cart -= g_cart.mean(axis=0, keepdims=True)
        f_inf = float(np.abs(g_cart).max())
        s_inf = float(np.abs(sigma).max())
        traj.append((e, f_inf, s_inf))
        log.info("relax_cell step %d  E=%.10f  max|F|=%.3e  max|s|=%.3e",
                 step, e, f_inf, s_inf)
        if callback is not None:
            callback(step, eps, dfrac, e, sigma, g_cart)
        if (f_inf < fmax or not relax_atoms) and s_inf < smax:
            converged = True
            break
        if step == max_steps:  # out of steps; final iterate checked above
            break

        def _project(gvec):
            gv = gvec.copy()
            gv[6:] = (gv[6:].reshape(natm, 3)
                      - gv[6:].reshape(natm, 3).mean(axis=0)).ravel()
            if not relax_atoms:
                gv[6:] = 0.0
            return gv

        g = _project(pack_grad(geps, gfrac))
        p = _project(-H @ g)
        scale = min(1.0,
                    eps_cap / max(np.abs(p[:6]).max(), 1e-30),
                    step_max / max(np.abs(p[6:]).max(), 1e-30))
        p *= scale
        x_new = x + p
        mf_new, cell_new, e_new, geps_new, gfrac_new = scf_at(
            *unpack(x_new), getattr(cur_mf, "dm", None))
        g_new = _project(pack_grad(geps_new, gfrac_new))
        if e_new > e + 1e-12 and np.abs(g_new).max() > np.abs(g).max():
            p *= 0.25
            x_new = x + p
            mf_new, cell_new, e_new, geps_new, gfrac_new = scf_at(
                *unpack(x_new), getattr(cur_mf, "dm", None))
            g_new = _project(pack_grad(geps_new, gfrac_new))
        s = x_new - x
        y = g_new - g
        sy = float(s @ y)
        if sy > 1e-12:
            rho = 1.0 / sy
            I = np.eye(n)
            V = I - rho * np.outer(s, y)
            H = V @ H @ V.T + rho * np.outer(s, s)
        x, e = x_new, e_new
        geps, gfrac = geps_new, gfrac_new
        cur_mf, cur_cell = mf_new, cell_new

        eps_now, dfrac_now = unpack(x)
        if (np.abs(eps_now).max() > re_anchor
                or np.abs(dfrac_now).max() > 5 * step_max):
            # accumulated deformation is leaving the anchored function's
            # frozen-list validity: re-anchor at the current cell (one
            # retrace), fold the displacement into the reference, reset BFGS
            a0 = a0 @ (np.eye(3) + eps_now)
            frac0 = frac0 + dfrac_now
            grad_fn = scf_stress.make_cell_grad_fn(
                cur_cell, kscaled0 @ cur_cell.reciprocal_vectors(),
                dtype=mf.dtype, exxdiv=mf_exxdiv, xc=mf_xc,
                hubbard=mf_hub)
            x = np.zeros(n)
            # keep the BFGS curvature: the re-anchored parametrization
            # differs from the old one only at O(eps_anchor) — refreshing
            # H to the seed at every anchor was measured to dither
            _, geps, gfrac = grad_fn(cur_mf)
            log.info("relax_cell: re-anchored (accumulated strain %.3f)",
                     float(np.abs(eps_now).max()))

    eps, dfrac = unpack(x)
    A = a0 @ (np.eye(3) + eps)
    vol = float(abs(np.linalg.det(A)))
    sigma = 0.5 * (geps + geps.T) / vol
    g_cart = gfrac @ np.linalg.inv(A).T
    g_cart -= g_cart.mean(axis=0, keepdims=True)
    return CellOptResult(converged=converged, cell=cur_cell, energy=e,
                         sigma=sigma, forces_max=float(np.abs(g_cart).max()),
                         mf=cur_mf, trajectory=traj, nsteps=len(traj) - 1)
