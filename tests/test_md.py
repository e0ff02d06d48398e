"""Born-Oppenheimer molecular dynamics (scf.md).

NVE velocity Verlet must conserve E_pot + E_kin to the O(dt^2) Verlet floor
on the discretized BO surface the SCF evaluates (the forces themselves are
FD-gated in test_forces.py), the COM must stay put under the net-force
projection, and the NVT integrators (BAOAB Langevin, CSVR) must exchange
energy with the bath in the right direction.  The reference has no force
capability, hence no dynamics.
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import md as scf_md


def h2_cell(d=1.4, box=8.0, mesh=20):
    shells = [Shell(l=0, exps=np.array([1.3, 0.25]),
                    coeffs=np.array([[0.5], [0.6]]))]
    return Cell(
        a=np.diag([box, box, box]),
        atom=[("H", np.array([box / 2, box / 2, box / 2 - d / 2])),
              ("H", np.array([box / 2, box / 2, box / 2 + d / 2]))],
        basis={"H": shells},
        pseudo=None,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def _mf(cell):
    return KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-10)


def test_maxwell_boltzmann_statistics():
    """Sampled velocities reproduce equipartition over the projected dofs
    and carry zero net momentum (pure numpy; no SCF)."""
    rng = np.random.default_rng(7)
    masses = scf_md.atom_masses(h2_cell(), masses=[1.008, 15.999] * 500)
    t = 300.0
    v = scf_md.maxwell_boltzmann(masses, t, rng)
    p = (masses[:, None] * v).sum(axis=0)
    assert np.abs(p).max() < 1e-8 * float(masses.sum())
    ek = 0.5 * float((masses[:, None] * v * v).sum())
    ndof = 3 * len(masses) - 3
    target = 0.5 * ndof * scf_md.KB_HARTREE * t
    # COM-projection rescale makes the per-draw total exact by construction
    np.testing.assert_allclose(ek, target, rtol=1e-12)


def test_nve_energy_conservation():
    """8 NVE steps at 300 K: total energy conserved to the Verlet floor,
    COM stationary, and the H2 bond oscillates without blowing up."""
    cell = h2_cell(d=1.4)
    res = scf_md.kernel(_mf(cell), dt_fs=0.3, nsteps=8, temperature=300.0,
                        seed=0)

    e_tot = res.energies
    assert len(e_tot) == 9
    drift = np.abs(e_tot - e_tot[0]).max()
    # Verlet shadow-Hamiltonian fluctuation, O(dt^2): measured 3.2e-4 at
    # dt=0.5 fs (bounded oscillation, no secular drift) -> ~1.2e-4 here
    assert drift < 3e-4, f"NVE energy drift {drift:.2e}"
    # bounded oscillation, not secular drift: endpoints agree more tightly
    assert abs(e_tot[-1] - e_tot[0]) < 2.5e-4

    # COM stationary under the mass-weighted net-force projection
    m = scf_md.atom_masses(cell)
    com0 = (m[:, None] * res.trajectory[0]["positions"]).sum(0) / m.sum()
    com1 = (m[:, None] * res.positions).sum(0) / m.sum()
    assert np.abs(com1 - com0).max() < 1e-6

    # bond bounded and the final SCF is converged at the final geometry
    bond = np.linalg.norm(res.positions[1] - res.positions[0])
    assert 0.7 < bond < 2.5
    assert res.mf.converged


def test_langevin_heats_from_rest():
    """BAOAB from zero velocities with a strong coupling: the bath must
    inject kinetic energy (T_inst rises from 0)."""
    cell = h2_cell(d=1.4)
    res = scf_md.kernel(_mf(cell), dt_fs=1.0, nsteps=4, temperature=600.0,
                        thermostat="langevin", friction_fs=2.0,
                        velocities0=np.zeros((2, 3)), seed=1)
    assert res.trajectory[0]["e_kin"] == 0.0
    assert res.trajectory[-1]["e_kin"] > 0.0
    assert 0.7 < np.linalg.norm(res.positions[1] - res.positions[0]) < 3.0


def test_csvr_rescales_toward_target():
    """CSVR with a tight coupling time keeps the instantaneous temperature
    within a canonical-fluctuation band of the target (3 dofs fluctuate
    hugely; the gate is a sanity band, not a sharp value)."""
    cell = h2_cell(d=1.4)
    res = scf_md.kernel(_mf(cell), dt_fs=0.5, nsteps=4, temperature=300.0,
                        thermostat="csvr", tau_fs=1.0, seed=2)
    t_inst = res.temperatures
    assert np.all(np.isfinite(t_inst))
    assert 5.0 < t_inst[-1] < 3000.0


def test_thermostat_validation():
    cell = h2_cell()
    with pytest.raises(ValueError):
        scf_md.kernel(_mf(cell), thermostat="nose")
    with pytest.raises(ValueError):
        scf_md.kernel(_mf(cell), thermostat="csvr")  # no temperature
    with pytest.raises(ValueError):
        scf_md.npt_kernel(_mf(cell), thermostat="csvr")  # no temperature


def lih_cell(a_lat, mesh=18):
    a = 0.5 * a_lat * (np.ones((3, 3)) - np.eye(3))
    li = [Shell(l=0, exps=np.array([16.0, 2.2]),
                coeffs=np.array([[0.8], [0.3]])),
          Shell(l=0, exps=np.array([0.6, 0.15]),
                coeffs=np.array([[0.5], [0.6]]))]
    h = [Shell(l=0, exps=np.array([1.3, 0.25]),
               coeffs=np.array([[0.5], [0.6]]))]
    frac = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    return Cell(a=a, atom=[("Li", frac[0] @ a), ("H", frac[1] @ a)],
                basis={"Li": li, "H": h}, pseudo=None,
                mesh=np.array([mesh] * 3), unit="bohr",
                precision=1e-12).build()


def test_npt_barostat_relaxes_compression():
    """NPH (no thermostat) from rest on a compressed LiH cell at P0=0 with
    a strong coupling: the barostat must expand the cell monotonically and
    reduce the internal pressure; the scaling stays isotropic (A remains
    proportional to the start lattice) and the inversion-symmetric atoms
    stay at their fractional positions."""
    cell = lih_cell(6.5)  # compressed vs the ~6.9 bohr equilibrium
    mf = KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-10)
    res = scf_md.npt_kernel(mf, dt_fs=1.0, nsteps=3, pressure_gpa=0.0,
                            taup_fs=5.0, compressibility_au=1.0)

    vols = res.volumes
    assert len(vols) == 4
    p = np.array([rec["pressure_au"] for rec in res.trajectory])
    assert p[0] > 0.0, "compressed start must be under positive pressure"
    assert np.all(np.diff(vols) > 0.0), f"volumes not increasing: {vols}"
    assert p[-1] < p[0], f"pressure did not relax: {p}"

    # isotropic: final lattice is a scalar multiple of the start lattice
    a_fin = np.asarray(res.cell.a)
    s = (vols[-1] / vols[0]) ** (1.0 / 3.0)
    np.testing.assert_allclose(a_fin, s * np.asarray(cell.a), rtol=1e-10)
    assert s > 1.0

    # fractional coordinates preserved (symmetric forces, barostat scales
    # positions with the cell)
    frac_fin = res.positions @ np.linalg.inv(a_fin)
    frac_0 = np.asarray(cell.atom_coords()) @ np.linalg.inv(
        np.asarray(cell.a))
    np.testing.assert_allclose(frac_fin, frac_0, atol=1e-6)
    assert res.mf.converged
    # enthalpy recorded and finite
    assert np.all(np.isfinite([rec["enthalpy"] for rec in res.trajectory]))
