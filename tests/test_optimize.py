"""Geometry relaxation on the analytic gradients (scf.optimize).

The optimizer must descend the discretized energy surface that the SCF
evaluates and stop at a point where the translation-projected force is below
the gate — using only scf.grad reverse-mode forces (FD-gated themselves in
test_forces.py).  The reference has no relaxation capability at all.
"""
import numpy as np

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import optimize as scf_opt


def h2_cell(d=2.0, box=8.0, mesh=20):
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


def test_h2_relaxation_converges():
    cell = h2_cell(d=2.0)
    mf = KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-10)
    res = scf_opt.kernel(mf, fmax=5e-4, max_steps=15)

    assert res.converged
    # translation-projected force gate holds at the reported geometry
    gv = res.grad - res.grad.mean(axis=0, keepdims=True)
    assert np.abs(gv).max() < 5e-4
    # energy decreased from the stretched start and the minimum is physical
    energies = [e for _, e, _ in res.trajectory]
    assert res.energy < energies[0] - 0.05
    bond = np.linalg.norm(res.positions[1] - res.positions[0])
    assert 1.0 < bond < 1.6
    # the final SCF object is converged at the final geometry
    assert res.mf.converged
    np.testing.assert_allclose(res.mf.e_tot, res.energy, atol=1e-8)
    # bond direction preserved (pure stretch problem): atoms stay on the z axis
    np.testing.assert_allclose(res.positions[:, :2],
                               [[4.0, 4.0], [4.0, 4.0]], atol=5e-3)


def test_h2_ks_relaxation_converges():
    """Relaxation driven by the KS-DFT (LDA) analytic forces: the optimizer
    must descend the KS surface (xc Pulay force FD-gated in
    test_forces.py) and stop at a physical bond."""
    from fftisdf_tpu.scf.ks import KRKS

    cell = h2_cell(d=2.0)
    mf = KRKS(cell, cell.get_kpts([1, 1, 1]), xc="lda", verbose=0,
              conv_tol=1e-10)
    res = scf_opt.kernel(mf, fmax=5e-4, max_steps=15)
    assert res.converged
    energies = [e for _, e, _ in res.trajectory]
    assert res.energy < energies[0] - 0.02
    bond = np.linalg.norm(res.positions[1] - res.positions[0])
    assert 1.0 < bond < 1.8
    np.testing.assert_allclose(res.mf.e_tot, res.energy, atol=1e-8)
