"""DOS gates (scf.dos): exact sum rules rather than golden numbers.

- total DOS integrates to the number of spin states (2*nao restricted,
  nao per unrestricted channel);
- Loewdin-projected DOS summed over atoms/AOs equals the total DOS
  identically (resolution of identity per band);
- integrated DOS up to the Fermi level counts the electrons;
- Gaussian and Lorentzian kernels are both normalized.
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import KRHF, KUHF
from fftisdf_tpu.scf import dos as dos_mod


@pytest.fixture(scope="module")
def diamond_rhf():
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-9)
    mf.kernel()
    assert mf.converged
    return mf


@pytest.fixture(scope="module")
def diamond_uhf(diamond_rhf):
    mf0 = diamond_rhf
    mf = KUHF(mf0.cell, mf0.kpts, verbose=0, conv_tol=1e-8, max_cycle=60)
    mf.kernel(dm0=np.stack([mf0.dm, mf0.dm]) * 0.5)
    assert mf.converged
    return mf


def _wide_grid(mf, sigma):
    allE = np.asarray(mf.mo_energy, dtype=float)
    return np.linspace(allE.min() - 12 * sigma, allE.max() + 12 * sigma,
                       4001)


@pytest.mark.parametrize("kind", ["gaussian", "lorentzian"])
def test_total_dos_integrates_to_state_count(diamond_rhf, kind):
    mf = diamond_rhf
    sigma = 0.02 if kind == "gaussian" else 0.05
    grid = _wide_grid(mf, 25.0 if kind == "lorentzian" else sigma)
    energies, d = dos_mod.density_of_states(mf, energies=grid, sigma=sigma,
                                            kind=kind)
    nao = mf.cell.nao_nr()
    total = np.trapezoid(d, energies)
    # lorentzian tails decay as 1/E^2: integrate on a very wide grid and
    # accept the tail loss
    tol = 1e-6 if kind == "gaussian" else 5e-2
    np.testing.assert_allclose(total, 2 * nao, rtol=tol)


def test_pdos_sums_to_total(diamond_rhf):
    mf = diamond_rhf
    energies, d = dos_mod.density_of_states(mf, sigma=0.03)
    for groupby in ("atom", "ao"):
        _, p = dos_mod.projected_dos(mf, energies=energies, sigma=0.03,
                                     groupby=groupby)
        np.testing.assert_allclose(p.sum(axis=0), d, atol=1e-10, rtol=0)
    _, p_atom = dos_mod.projected_dos(mf, energies=energies, sigma=0.03,
                                      groupby="atom")
    assert p_atom.shape == (mf.cell.natm, energies.size)


def test_integrated_dos_counts_electrons(diamond_rhf):
    mf = diamond_rhf
    sigma = 5e-3
    grid = _wide_grid(mf, sigma)
    energies, d = dos_mod.density_of_states(mf, energies=grid, sigma=sigma)
    n_below = dos_mod.integrated_dos(energies, d, dos_mod.fermi_level(mf))
    np.testing.assert_allclose(n_below, mf.cell.nelectron, atol=1e-3)


def test_unrestricted_channels(diamond_uhf):
    mf = diamond_uhf
    energies, d = dos_mod.density_of_states(mf, sigma=0.02)
    assert d.shape == (2, energies.size)
    _, p = dos_mod.projected_dos(mf, energies=energies, sigma=0.02)
    assert p.shape[0] == 2 and p.shape[1] == mf.cell.natm
    np.testing.assert_allclose(p.sum(axis=1), d, atol=1e-10, rtol=0)
    # closed-shell UHF: both channels identical
    np.testing.assert_allclose(d[0], d[1], atol=1e-6)


def test_fermi_level_midgap(diamond_rhf):
    """Diamond is an insulator: the Fermi level must sit strictly between
    the HOMO and LUMO band edges."""
    mf = diamond_rhf
    ef = dos_mod.fermi_level(mf)
    e = np.asarray(mf.mo_energy, dtype=float)
    occ = np.asarray(mf.mo_occ, dtype=float)
    homo = e[occ > 1e-6].max()
    lumo = e[occ <= 1e-6].min()
    assert homo < ef < lumo
