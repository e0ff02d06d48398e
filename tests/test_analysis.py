"""Population-analysis gates (scf.analysis).

Invariants rather than golden numbers: total population = electron count
(both schemes, any basis), Loewdin equals Mulliken in an orthonormal
basis, restricted/unrestricted consistency, and spin moments sum to the
spin imbalance.
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import KRHF, KUHF
from fftisdf_tpu.scf import analysis


@pytest.fixture(scope="module")
def diamond_rhf():
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-9)
    mf.kernel()
    assert mf.converged
    return mf


@pytest.mark.parametrize("scheme", ["mulliken", "loewdin"])
def test_population_sums_to_electron_count(diamond_rhf, scheme):
    mf = diamond_rhf
    pop = analysis.ao_populations(mf.cell, mf.dm, mf.s1e, scheme=scheme)
    np.testing.assert_allclose(pop.sum(), mf.cell.nelectron, atol=1e-8)


@pytest.mark.parametrize("scheme", ["mulliken", "loewdin"])
def test_charges_sum_to_zero_and_symmetry(diamond_rhf, scheme):
    mf = diamond_rhf
    charges, moments = analysis.atom_charges_and_moments(
        mf.cell, mf.dm, mf.s1e, scheme=scheme)
    np.testing.assert_allclose(charges.sum(), 0.0, atol=1e-8)
    # equivalent C atoms carry equal charge (to the converged-density
    # tail); restricted -> zero moments
    np.testing.assert_allclose(charges[0], charges[1], atol=1e-5)
    np.testing.assert_allclose(moments, 0.0, atol=1e-12)


def test_unrestricted_moments_sum_to_spin(diamond_rhf):
    """KUHF with an enforced spin imbalance: moments sum to na - nb."""
    mf0 = diamond_rhf
    cell = mf0.cell.copy(spin=2).build()
    mf = KUHF(cell, mf0.kpts, verbose=0, conv_tol=1e-7,
              smearing=5e-3, max_cycle=60)
    mf.kernel()
    charges, moments = analysis.atom_charges_and_moments(
        cell, mf.dm, mf.s1e)
    na, nb = mf.nocc_ab
    np.testing.assert_allclose(moments.sum(), na - nb, atol=1e-6)
    np.testing.assert_allclose(charges.sum(), 0.0, atol=1e-6)


def test_loewdin_equals_mulliken_orthonormal(diamond_rhf):
    """With S = 1 the two schemes coincide by construction."""
    mf = diamond_rhf
    nk, nao = mf.s1e.shape[:2]
    eye = np.broadcast_to(np.eye(nao), (nk, nao, nao)).copy()
    rng = np.random.default_rng(0)
    d = rng.standard_normal((nk, nao, nao)) \
        + 1j * rng.standard_normal((nk, nao, nao))
    dm = d + np.conj(np.swapaxes(d, -1, -2))
    p_m = analysis.ao_populations(mf.cell, dm, eye, scheme="mulliken")
    p_l = analysis.ao_populations(mf.cell, dm, eye, scheme="loewdin")
    np.testing.assert_allclose(p_l, p_m, atol=1e-10)
