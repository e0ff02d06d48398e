"""Variable-cell relaxation machinery gates (scf.optimize.relax_cell).

Physical end-to-end cell relaxations live in examples/ (crude test systems
have egg-box-limited stress floors); what must hold exactly regardless of
the surface's quality:

1. every iterate's reported energy is the SCF total energy of the cell the
   optimizer actually built (Lagrangian consistency through the anchored
   function),
2. the trajectory descends from a compressed start,
3. re-anchoring is equivalence-preserving: forcing a re-anchor after every
   step must reproduce the never-re-anchored trajectory to the anchored-
   function's O(eps^2) accuracy — a sharp gate on the a0/frac folding and
   BFGS bookkeeping across anchor changes.
"""
import numpy as np

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import optimize as scf_opt


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


def _run(re_anchor, max_steps=3):
    cell = lih_cell(6.8)
    mf = KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-10)
    return scf_opt.relax_cell(mf, smax=1e-9, max_steps=max_steps,
                              relax_atoms=False, re_anchor=re_anchor)


def test_trajectory_descends_and_energy_is_scf_energy():
    res = _run(re_anchor=0.5)
    energies = [e for e, _, _ in res.trajectory]
    assert all(b < a for a, b in zip(energies, energies[1:]))
    # the reported energy IS the SCF total energy at the final cell
    np.testing.assert_allclose(res.energy, res.mf.e_tot, atol=1e-10)
    # and re-running an SCF from scratch on the returned cell agrees with
    # the warm-started one to SCF tolerance (same tracked branch this close
    # to the start)
    mf2 = KRHF(res.cell, res.cell.get_kpts([1, 1, 1]), verbose=0,
               conv_tol=1e-10)
    e2 = mf2.kernel()
    assert mf2.converged
    np.testing.assert_allclose(e2, res.energy, atol=1e-6)


def test_nongamma_kpts_deform_with_cell():
    """k-points must scale with the strained lattice (fixed fractional k):
    with the reference Cartesian kpts fed to strained SCFs, the Lagrangian
    would disagree with the SCF energy at O(eps) — regression for the
    k-point-consistency fix."""
    cell = lih_cell(6.8, mesh=16)
    mf = KRHF(cell, cell.get_kpts([1, 1, 2]), verbose=0, conv_tol=1e-10)
    res = scf_opt.relax_cell(mf, smax=1e-9, max_steps=2, relax_atoms=False)
    energies = [e for e, _, _ in res.trajectory]
    assert all(b < a for a, b in zip(energies, energies[1:]))
    np.testing.assert_allclose(res.energy, res.mf.e_tot, atol=1e-10)


def test_clone_preserves_subclass_fields():
    """_clone_mf must carry KUHF-only knobs (init_spin etc.) — dropping
    them silently relaxes AFM systems on the unbiased surface."""
    from fftisdf_tpu.scf import KUHF
    from fftisdf_tpu.scf.optimize import _clone_mf

    cell = lih_cell(6.8)
    mf = KUHF(cell, cell.get_kpts([1, 1, 1]), verbose=0,
              init_spin={0: 1}, spin_bias=0.3, bias_cycles=2,
              smearing=1e-2, smearing_method="gauss")
    c = _clone_mf(mf, cell)
    assert c.init_spin == {0: 1}
    assert c.spin_bias == 0.3 and c.bias_cycles == 2
    assert c.smearing == 1e-2 and c.smearing_method == "gauss"
    assert c.converged is False and c.e_tot is None


def test_reanchor_preserves_trajectory():
    res_far = _run(re_anchor=0.5)    # never re-anchors in 3 steps
    res_near = _run(re_anchor=1e-9)  # re-anchors after every step
    e_far = np.array([e for e, _, _ in res_far.trajectory])
    e_near = np.array([e for e, _, _ in res_near.trajectory])
    assert len(e_far) == len(e_near)
    # step-0 energies identical (same start); later iterates agree to the
    # anchored-function error at <= 2% strain steps
    np.testing.assert_allclose(e_far[0], e_near[0], atol=1e-12)
    np.testing.assert_allclose(e_far, e_near, atol=2e-3)
