"""Frozen-phonon gates (scf.phonon).

Two exact internal identities, computed through independent code paths:

* band folding — the mass-weighted eigenvalues of the FULL supercell
  Hessian (every atom displaced, scf.hessian) must equal the union of
  eig(D(q)) over the commensurate q-set, where D(q) is Fourier-assembled
  from force constants measured by displacing HOME-CELL atoms only
  (scf.phonon row-restricted path).  This checks the supercell translation
  invariance of the force constants, the image phase convention, and the
  mass weighting at once.
* acoustic sum rule — after enforce_asr, the three q = 0 acoustic modes
  are exactly zero for a single-species cell.
"""
import numpy as np

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import hessian as scf_hess
from fftisdf_tpu.scf import phonon

AXY = 7.0     # bohr, transverse box
AZ = 3.2      # bohr, chain spacing
MESH = (12, 12, 6)


def he_chain_cell():
    shells = [Shell(l=0, exps=np.array([2.5, 0.7]),
                    coeffs=np.array([[0.6], [0.5]]))]
    return Cell(
        a=np.diag([AXY, AXY, AZ]),
        atom=[("He", np.array([AXY / 2, AXY / 2, 0.0]))],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array(MESH),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_phonon_folding_asr_and_interpolation():
    cell = he_chain_cell()
    mf = KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-11)
    nrep = (1, 1, 2)

    res = phonon.kernel(mf, nrep, step=2e-3, asr=False)
    assert res.fc.shape == (1, 3, 2, 1, 3)
    assert res.mf_sc.converged

    # --- band folding: supercell Gamma phonons == union over commensurate q
    hess_sc, _ = scf_hess.kernel(res.mf_sc, step=2e-3)
    m = phonon.atom_masses_me(res.mf_sc.cell)
    minv = 1.0 / np.sqrt(np.repeat(m, 3))
    ev = np.linalg.eigvalsh(hess_sc * minv[:, None] * minv[None, :])
    w_sc = np.sort(np.sign(ev) * np.sqrt(np.abs(ev))
                   * scf_hess.HARTREE_TO_CM1)

    qpts = cell.get_kpts(nrep)                      # commensurate set
    w_fold = np.sort(res.frequencies(qpts).ravel())
    # FD noise floor in wavenumbers; both paths use the same step
    np.testing.assert_allclose(w_fold, w_sc, atol=2.0)

    # --- D(q) is hermitian by construction and finite off the mesh
    q_half = np.array([0.0, 0.0, 0.5 * np.pi / AZ])  # incommensurate
    d = res.dynamical_matrix(q_half)
    assert np.abs(d - d.conj().T).max() < 1e-14
    w_half = res.frequencies(q_half)
    assert np.isfinite(w_half).all()

    # --- acoustic sum rule: exactly three zero modes at Gamma for a
    # single-species cell (the raw constants carry the egg-box offset)
    fc_asr = phonon.enforce_asr(res.fc)
    w0 = phonon.frequencies(fc_asr, res.masses_me, res.images,
                            np.zeros(3))[0]
    # sqrt amplifies the machine-epsilon sum-rule residual: eps ~ 1e-18
    # Ha/bohr^2 maps to sqrt(eps/m) ~ 1e-5 cm^-1, so "zero" is < 1e-3
    assert np.abs(w0).max() < 1e-3
    # sum rule holds exactly on the constants themselves
    assert np.abs(fc_asr.sum(axis=(2, 3))).max() < 1e-12

    # without ASR the Gamma modes sit at the egg-box artifact, not zero:
    # the rule must change something for the gate above to be meaningful
    w0_raw = res.frequencies(np.zeros(3))[0]
    assert not np.allclose(w0_raw, 0.0, atol=1e-8)


def test_thermodynamics_einstein_closed_form():
    """With a q-independent (Einstein) dynamical matrix, the BZ-sampled
    thermodynamics must equal the single-oscillator closed form exactly."""
    from fftisdf_tpu.scf.phonon import (KB_HA, HARTREE_TO_CM1,
                                        thermodynamics)

    cell = he_chain_cell()
    m = phonon.atom_masses_me(cell)
    w0 = 1.2e-3                                  # Ha
    # self-term-only force constants: D(q) = w0^2 * I for every q
    fc = np.zeros((1, 3, 2, 1, 3))
    fc[0, :, 0, 0, :] = np.eye(3) * (w0 ** 2) * m[0]
    images = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, AZ]])

    w = phonon.frequencies(fc, m, images, cell.get_kpts([1, 1, 4]))
    np.testing.assert_allclose(w, w0 * HARTREE_TO_CM1, rtol=1e-12)

    t = 300.0
    out = thermodynamics(fc, m, images, cell, (1, 1, 4), t)
    x = w0 / (KB_HA * t)
    nmode = 3
    np.testing.assert_allclose(out["zpe"], nmode * w0 / 2, rtol=1e-12)
    np.testing.assert_allclose(
        out["f_vib"], nmode * (w0 / 2 + KB_HA * t * np.log1p(-np.exp(-x))),
        rtol=1e-12)
    np.testing.assert_allclose(
        out["u_vib"], nmode * (w0 / 2 + w0 / np.expm1(x)), rtol=1e-12)
    np.testing.assert_allclose(
        out["cv"], nmode * KB_HA * x * x * np.exp(x) / np.expm1(x) ** 2,
        rtol=1e-10)
    np.testing.assert_allclose(out["s_vib"],
                               (out["u_vib"] - out["f_vib"]) / t, rtol=1e-12)
    # T = 0: free energy reduces to the ZPE, no entropy
    out0 = thermodynamics(fc, m, images, cell, (1, 1, 2), 0.0)
    assert out0["f_vib"] == out0["zpe"] and out0["cv"] == 0.0

    # an unstable mode raises
    fc_bad = fc.copy()
    fc_bad[0, 2, 0, 0, 2] = -(w0 ** 2) * m[0]
    try:
        thermodynamics(fc_bad, m, images, cell, (1, 1, 2), t)
        assert False, "expected ValueError on imaginary modes"
    except ValueError:
        pass
