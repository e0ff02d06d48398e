"""Elastic-tensor gates (scf.elastic).

Three identities through independent code paths on a simple-cubic He
crystal (custom 2-primitive s basis, exact-PW two-electron energy):

* Maxwell symmetry — C[0,1] (stress row 1 under strain e2) vs C[1,0]
  (stress row 2 under strain e1): disjoint strained SCF solves;
* cubic symmetry — C11 from strain e1 equals C22 from strain e2;
* energy second-FD — (E+ - 2 E0 + E-) / (h^2 V0) from the strained SCF
  total energies must match the stress-FD C_JJ (a path through the
  energy, not the analytic gradient).

Plus pure-function unit checks on the Voigt packing round trip.
"""
import numpy as np

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import elastic

A0 = 4.0


def he_sc_cell():
    shells = [Shell(l=0, exps=np.array([2.5, 0.7]),
                    coeffs=np.array([[0.6], [0.5]]))]
    return Cell(
        a=np.diag([A0, A0, A0]),
        atom=[("He", np.zeros(3))],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array([10, 10, 10]),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_voigt_roundtrip():
    rng = np.random.default_rng(3)
    e = rng.standard_normal(6)
    eps = elastic.voigt_strain(e)
    assert np.abs(eps - eps.T).max() == 0.0
    # stress-type packing undoes strain-type packing on the diagonal and
    # recovers engineering shears as twice the tensor off-diagonals
    back = elastic.stress_to_voigt(eps)
    np.testing.assert_allclose(back[:3], e[:3], rtol=1e-15)
    np.testing.assert_allclose(back[3:], e[3:] / 2.0, rtol=1e-15)


def test_elastic_maxwell_cubic_and_energy_fd():
    cell = he_sc_cell()
    mf = KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-11)
    mf.kernel()
    assert mf.converged

    res = elastic.kernel(mf, step=3e-3, components=(0, 1))
    c = res.c
    assert np.isfinite(c[:, [0, 1]]).all() and np.isnan(c[2, 2])

    # cubic reference state: the analytic stress is isotropic
    np.testing.assert_allclose(np.diag(res.sigma0),
                               res.sigma0[0, 0], rtol=1e-8)
    assert abs(res.e0 - mf.e_tot) < 1e-9

    scale = abs(c[0, 0])
    # Maxwell symmetry: disjoint SCF solves (strain e2 vs strain e1)
    assert abs(c[0, 1] - c[1, 0]) < 5e-4 * scale
    # cubic symmetry: C11 == C22 measured along different axes
    assert abs(c[0, 0] - c[1, 1]) < 5e-4 * scale

    # energy-FD cross-gate from the same runs' total energies
    h = res.step
    for j in (0, 1):
        ej = res.energies[j]
        c_e = (ej["e_plus"] - 2.0 * res.e0 + ej["e_minus"]) \
            / (h * h * float(cell.vol))
        assert abs(c_e - c[j, j]) < 5e-3 * scale

    # moduli helpers consume the (here partial) matrix without error on
    # a full synthetic tensor
    full = np.diag([3.0, 3.0, 3.0, 1.0, 1.0, 1.0])
    full[:3, :3] += 1.0 - np.eye(3)
    r2 = elastic.ElasticResult(c=full, sigma0=np.zeros((3, 3)), e0=0.0,
                               step=h, components=tuple(range(6)))
    np.testing.assert_allclose(r2.bulk_modulus_voigt(), (9.0 + 6.0) / 9.0)
    np.testing.assert_allclose(r2.shear_modulus_voigt(),
                               (9.0 - 3.0 + 9.0) / 15.0)
    assert np.allclose(r2.c_gpa, full * elastic.HA_PER_BOHR3_TO_GPA)
