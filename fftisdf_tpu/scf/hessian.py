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


class _FrozenPointDF:
    """Minimal J/K provider from a frozen-interpolation-point ISDF state
    re-fitted at a displaced geometry ((x_k, wq) arrays, not a full build).
    Mirrors FFTISDF.get_jk's calling convention for the SCF drivers."""

    def __init__(self, x_k, wq, phase, s1e=None, mad=None):
        import jax.numpy as jnp
        from fftisdf_tpu.utils.device import to_device

        self.x_k, self.wq = x_k, wq
        self.phase = to_device(phase, dtype=wq.dtype)
        # for exxdiv='ewald' serving: the displaced geometry's overlap and
        # the (geometry-independent) Madelung constant
        self.s1e = None if s1e is None else to_device(s1e, dtype=wq.dtype)
        self.mad = mad
        self._jnp = jnp

    def get_jk(self, dm_kpts, with_j=True, with_k=True, exxdiv=None,
               omega=None, kpts_band=None):
        if exxdiv not in (None, "ewald") or omega is not None \
                or kpts_band is not None:
            raise NotImplementedError(
                "FrozenPointDF supports exxdiv in (None, 'ewald') J/K only")
        if exxdiv == "ewald" and (self.s1e is None or self.mad is None):
            raise NotImplementedError(
                "construct _FrozenPointDF with (s1e, mad) for "
                "exxdiv='ewald' serving")
        import jax
        from functools import partial
        from fftisdf_tpu.isdf import jk as jk_mod
        from fftisdf_tpu.utils.device import to_device

        jnp = self._jnp
        single = np.asarray(dm_kpts).ndim == 3 if not isinstance(
            dm_kpts, jax.Array) else dm_kpts.ndim == 3
        dm = to_device(dm_kpts, dtype=self.wq.dtype)

        @partial(jax.jit,
                 static_argnames=("with_j", "with_k", "single", "ewald"))
        def _kernel(x_k, wq, phase, dm, s1e, mad, with_j, with_k, single,
                    ewald):
            if single:
                dm = dm[None]
            vj = jk_mod.get_j_kpts(x_k, wq[0], dm) if with_j else None
            vk = jk_mod.get_k_kpts(x_k, wq, phase, dm) if with_k else None
            if with_k and ewald:
                vk = jk_mod.add_ewald_exx(vk, s1e, dm, mad)
            if single:
                vj = None if vj is None else vj[0]
                vk = None if vk is None else vk[0]
            return vj, vk

        ewald = exxdiv == "ewald"
        s1e = self.s1e if ewald else jnp.zeros(())
        mad = self.mad if ewald else 0.0
        return _kernel(self.x_k, self.wq, self.phase, dm, s1e, mad,
                       with_j=with_j, with_k=with_k, single=single,
                       ewald=ewald)


def kernel(mf, step=1e-3, two_electron="pw", df=None, symmetrize=True,
           rows=None):
    """Nuclear Hessian d2E/dR2, shape (3*natm, 3*natm), Ha/bohr^2.

    ``mf`` must be converged at the reference geometry.  Each displaced SCF
    warm-starts from ``mf.dm``.  With ``two_electron='isdf'`` the
    interpolation points of ``df`` stay frozen across displacements AND the
    displaced SCFs serve J/K from the frozen-point approximant re-fitted at
    the displaced positions (a small ``_FrozenPointDF`` provider), so the
    density each gradient is evaluated at is stationary for exactly the
    functional being differentiated — serving the reference-geometry state
    instead would leak an O(step) odd density error into the central
    difference as a step-independent Hessian bias.
    Returns ``(hess, g0)`` with ``g0`` the analytic gradient at the
    reference geometry.

    ``rows`` (optional) restricts the displaced coordinates to the given
    flat indices into ``(3*natm,)``; the result then has shape
    ``(len(rows), 3*natm)`` — the mixed-derivative rows
    ``d(grad_j)/d(x_i)`` for ``i in rows``.  This is the supercell
    force-constant entry point (scf.phonon displaces home-cell atoms only
    but needs force responses on every supercell atom); ``symmetrize`` is
    ignored for partial rows.
    """
    assert getattr(mf, "dm", None) is not None and mf.converged
    if getattr(mf, "trunc", None) is not None:
        raise NotImplementedError(
            "Hessians with a truncated Coulomb kernel (the displaced "
            "gradients trace the bare-kernel functional)")
    cell = mf.cell
    x0 = np.asarray(cell.atom_coords(), dtype=np.float64)
    natm = len(x0)
    n = 3 * natm
    mf_exxdiv = getattr(mf, "exxdiv", None)
    grad_fn = scf_grad.make_grad_fn(cell, mf.kpts, two_electron=two_electron,
                                    df=df, exxdiv=mf_exxdiv,
                                    xc=getattr(mf, "xc", None),
                                    hubbard=getattr(mf, "hubbard", None))
    if two_electron == "isdf":
        import jax
        import jax.numpy as jnp
        from fftisdf_tpu.isdf.autodiff import isdf_state_fn

        dt = scf_grad._default_dtype()
        state = jax.jit(isdf_state_fn(cell, mf.kpts, df.mask, m0=df.m0,
                                      solver=df.solver, rcond=df.rcond,
                                      dtype=dt))
        phase_host = df.phase
        mad = None
        if mf_exxdiv == "ewald":
            from fftisdf_tpu.lattice import kpoints as kpt_mod
            from fftisdf_tpu.scf.integrals import madelung

            mad = float(madelung(cell, kpt_mod.kpts_to_kmesh(cell,
                                                             mf.kpts)))

    def grad_at(positions):
        new_cell = cell.copy(
            atom=[(sym, np.asarray(p)) for sym, p in
                  zip(cell.atom_symbols(), positions)]).build()
        new_mf = _clone_mf(mf, new_cell)
        if two_electron == "isdf":
            x_k, wq = state(jnp.asarray(positions, dtype=dt))
            # new_mf's overlap is the displaced geometry's (computed in
            # _clone_mf's __post_init__) — what ewald exx must contract with
            new_mf.with_df = _FrozenPointDF(x_k, wq, phase_host,
                                            s1e=new_mf.s1e, mad=mad)
        new_mf.kernel(dm0=mf.dm)
        if not new_mf.converged:
            raise RuntimeError("SCF did not converge at a displaced "
                               "geometry; reduce `step` or loosen conv_tol")
        g, _ = grad_fn(new_mf)
        return np.asarray(g, dtype=np.float64).ravel()

    g0, _ = grad_fn(mf)
    idx = list(range(n)) if rows is None else [int(i) for i in rows]
    hess = np.empty((len(idx), n))
    for r, i in enumerate(idx):
        dx = np.zeros(n)
        dx[i] = step
        gp = grad_at((x0.ravel() + dx).reshape(-1, 3))
        gm = grad_at((x0.ravel() - dx).reshape(-1, 3))
        hess[r] = (gp - gm) / (2.0 * step)
    if symmetrize and rows is None:
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
