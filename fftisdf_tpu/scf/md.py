"""Born-Oppenheimer molecular dynamics on the analytic nuclear forces.

Velocity-Verlet NVE integration, with optional canonical (NVT) sampling via
a BAOAB Langevin integrator (Leimkuhler-Matthews splitting; the
configurational-sampling-optimal discretization) or Bussi-Donadio-Parrinello
canonical stochastic velocity rescaling (CSVR).  Every step fully
re-converges the SCF at the new geometry (warm-started from the previous
density matrix) and takes the force from one reverse-mode sweep through the
whole stack (``scf.grad`` via :class:`scf.optimize.BOForceField`) — so the
dynamics runs on exactly the discretized Born-Oppenheimer surface the SCF
evaluates, and NVE trajectories conserve the total energy to the Verlet
O(dt^2) floor (gated in ``tests/test_md.py``).

The reference (`/root/reference/fftisdf.py` and friends) is single-point
only — no forces, hence no dynamics; this module is a downstream consumer
of the force capability, in the same relationship to the reference as
``scf.optimize``.

Units: positions bohr, energies hartree, time fs at the API surface
(converted to atomic time units internally), temperature kelvin, masses
from the standard atomic weights (``basis.data.ATOMIC_MASS``).

Net-force projection: a rigid translation is an exact symmetry of the
continuum energy; on the FFT mesh the egg-box artifact gives the forces a
tiny spurious net component.  Following it would accelerate the center of
mass without physical meaning, so the COM acceleration is projected out of
every force (mass-weighted, preserving internal dynamics) — the MD analog
of the translation projection in ``scf.optimize``.
"""
from dataclasses import dataclass, field

import numpy as np

from fftisdf_tpu.basis.data import ATOMIC_MASS, element_symbol
from fftisdf_tpu.scf.optimize import BOForceField
from fftisdf_tpu.utils.logging import Logger

KB_HARTREE = 3.166811563e-6        # Boltzmann constant (Ha/K)
AU_TIME_FS = 2.4188843265857e-2    # one atomic time unit in fs
AMU_TO_ME = 1822.888486209         # electron masses per amu


@dataclass
class MDResult:
    positions: np.ndarray          # (natm, 3) bohr, final geometry
    velocities: np.ndarray         # (natm, 3) bohr / a.u. time
    mf: object                     # converged SCF at the final geometry
    # per recorded step: dict(t_fs, positions, e_pot, e_kin, e_tot, temp_k)
    trajectory: list = field(default_factory=list)
    nsteps: int = 0

    @property
    def energies(self):
        """(nrec,) total energies e_pot + e_kin along the trajectory."""
        return np.array([rec["e_tot"] for rec in self.trajectory])

    @property
    def temperatures(self):
        return np.array([rec["temp_k"] for rec in self.trajectory])


def atom_masses(cell, masses=None):
    """(natm,) masses in electron-mass units (atomic units), from the
    standard atomic weights unless overridden by ``masses`` (amu)."""
    if masses is None:
        masses = [ATOMIC_MASS[element_symbol(s)]
                  for s in cell.atom_symbols()]
    return np.asarray(masses, dtype=np.float64) * AMU_TO_ME


def maxwell_boltzmann(masses_me, temperature, rng, remove_com=True):
    """(natm, 3) velocities sampled at ``temperature`` K, COM removed.

    After COM removal the kinetic energy is rescaled back onto the
    ``3*natm - 3`` internal degrees of freedom so <E_kin> matches the
    equipartition value for the projected system."""
    natm = len(masses_me)
    v = rng.standard_normal((natm, 3)) * np.sqrt(
        KB_HARTREE * temperature / masses_me)[:, None]
    if remove_com and natm > 1:
        p = (masses_me[:, None] * v).sum(axis=0)
        v -= p / masses_me.sum()
        ndof = 3 * natm - 3
        ek = 0.5 * float((masses_me[:, None] * v * v).sum())
        target = 0.5 * ndof * KB_HARTREE * temperature
        if ek > 0:
            v *= np.sqrt(target / ek)
    return v


def _project_net_force(force, masses_me):
    """Remove the COM acceleration: F_i -= m_i * (sum_j F_j) / M_tot."""
    net = force.sum(axis=0)
    return force - masses_me[:, None] * (net / masses_me.sum())


def _csvr_factor(e_kin, e_kin_target, ndof, c, rng):
    """Bussi-Donadio-Parrinello stochastic velocity-rescaling factor
    (J. Chem. Phys. 126, 014101 (2007), eq. A7): alpha^2 for one step with
    decay factor c = exp(-dt/tau).  Samples the exact canonical kinetic-
    energy distribution over the ``ndof`` internal degrees of freedom."""
    if e_kin <= 0.0:
        # no kinetic energy to rescale: inject the full target via a
        # one-step draw (degenerate start; next steps proceed normally)
        return None
    r1 = rng.standard_normal()
    s = rng.chisquare(ndof - 1) if ndof > 1 else 0.0
    ratio = e_kin_target / (ndof * e_kin)
    a2 = (c + (1.0 - c) * ratio * (r1 * r1 + s)
          + 2.0 * r1 * np.sqrt(c * (1.0 - c) * ratio))
    return np.sqrt(max(a2, 0.0))


def kernel(mf, dt_fs=0.5, nsteps=20, temperature=None, thermostat=None,
           friction_fs=100.0, tau_fs=100.0, velocities0=None, seed=0,
           two_electron="pw", isdf_kwargs=None, callback=None,
           log_every=1):
    """Run ``nsteps`` of Born-Oppenheimer MD from ``mf.cell``'s geometry.

    ``thermostat``: None (NVE velocity Verlet), ``'langevin'`` (BAOAB with
    friction time ``friction_fs``), or ``'csvr'`` (velocity Verlet + Bussi
    stochastic rescaling with coupling time ``tau_fs``); both NVT modes
    require ``temperature``.  Initial velocities: ``velocities0`` (natm, 3)
    in bohr per a.u. time, else Maxwell-Boltzmann at ``temperature`` (zero
    if no temperature either).  ``two_electron``/``isdf_kwargs`` select the
    force backend exactly as in :func:`scf.optimize.kernel`.  Returns an
    :class:`MDResult`; ``callback(step, positions, velocities, e_pot)`` runs
    after each recorded step.
    """
    log = Logger(getattr(mf, "verbose", 3))
    if thermostat not in (None, "nve", "langevin", "csvr"):
        raise ValueError(f"unknown thermostat {thermostat!r}")
    if thermostat == "nve":
        thermostat = None
    if thermostat is not None and temperature is None:
        raise ValueError(f"thermostat {thermostat!r} requires a temperature")

    cell = mf.cell
    ff = BOForceField(mf, two_electron=two_electron,
                      isdf_kwargs=isdf_kwargs)
    m = atom_masses(cell)                       # (natm,) electron masses
    natm = len(m)
    ndof = max(3 * natm - 3, 1)                 # COM projected out
    dt = dt_fs / AU_TIME_FS                     # atomic time units
    rng = np.random.default_rng(seed)

    x = np.asarray(cell.atom_coords(), dtype=np.float64)
    if velocities0 is not None:
        v = np.asarray(velocities0, dtype=np.float64).copy()
    elif temperature is not None:
        v = maxwell_boltzmann(m, temperature, rng)
    else:
        v = np.zeros_like(x)

    def forces(positions, dm0):
        mf_c, e, g = ff(positions, dm0)
        return mf_c, e, _project_net_force(-g, m)

    # seed from the caller's mf if already converged at the start geometry
    usable = (getattr(mf, "dm", None) is not None and mf.converged
              and (two_electron != "isdf" or hasattr(mf.with_df, "wq")))
    if usable:
        e_pot, g = ff.eval_converged(mf)
        cur_mf, f = mf, _project_net_force(-g, m)
    else:
        cur_mf, e_pot, f = forces(x, None)

    def ekin(v):
        return 0.5 * float((m[:, None] * v * v).sum())

    def record(step, e_pot, v):
        ek = ekin(v)
        rec = dict(t_fs=step * dt_fs, positions=x.copy(), e_pot=e_pot,
                   e_kin=ek, e_tot=e_pot + ek,
                   temp_k=2.0 * ek / (ndof * KB_HARTREE))
        traj.append(rec)
        if step % log_every == 0:
            log.info("md step %4d  t=%7.2f fs  E_pot=%.10f  E_tot=%.10f  "
                     "T=%7.1f K", step, rec["t_fs"], e_pot, rec["e_tot"],
                     rec["temp_k"])
        if callback is not None:
            callback(step, x, v, e_pot)

    traj = []
    record(0, e_pot, v)

    if thermostat == "langevin":
        gamma = 1.0 / (friction_fs / AU_TIME_FS)      # 1 / a.u. time
        c1 = np.exp(-gamma * dt)
        c2 = np.sqrt((1.0 - c1 * c1) * KB_HARTREE * temperature / m)[:, None]
    e_kin_target = (0.5 * ndof * KB_HARTREE * temperature
                    if temperature is not None else None)

    for step in range(1, nsteps + 1):
        if thermostat == "langevin":
            # BAOAB: B (half kick) A (half drift) O (exact OU) A B
            v = v + 0.5 * dt * f / m[:, None]
            x = x + 0.5 * dt * v
            v = c1 * v + c2 * rng.standard_normal((natm, 3))
            x = x + 0.5 * dt * v
            cur_mf, e_pot, f = forces(x, getattr(cur_mf, "dm", None))
            v = v + 0.5 * dt * f / m[:, None]
        else:
            # velocity Verlet
            vh = v + 0.5 * dt * f / m[:, None]
            x = x + dt * vh
            cur_mf, e_pot, f = forces(x, getattr(cur_mf, "dm", None))
            v = vh + 0.5 * dt * f / m[:, None]
            if thermostat == "csvr":
                alpha = _csvr_factor(ekin(v), e_kin_target, ndof,
                                     np.exp(-dt_fs / tau_fs), rng)
                if alpha is None:
                    v = maxwell_boltzmann(m, temperature, rng)
                else:
                    v = alpha * v

        record(step, e_pot, v)
        drift = ff.maybe_reanchor(cur_mf.cell, x)
        if drift is not None:
            log.info("md: re-anchored gradient fn (displacement %.2f bohr)",
                     drift)

    return MDResult(positions=x, velocities=v, mf=cur_mf, trajectory=traj,
                    nsteps=nsteps)
