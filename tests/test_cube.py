"""Cube-export gates (utils.cube): round-trip parse + physical integrals.

- density cube integrates to the electron count (grid quadrature is the
  SCF's own quadrature, so this is near-exact);
- spin channels sum to the total; closed-shell spin density is zero;
- an occupied crystal orbital's |psi|^2 cube integrates to 1;
- header carries the right mesh/voxels/atoms.
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import KRHF, KUHF
from fftisdf_tpu.utils import cube


@pytest.fixture(scope="module")
def diamond_rhf():
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-9)
    mf.kernel()
    assert mf.converged
    return mf


def test_density_cube_roundtrip(diamond_rhf, tmp_path):
    mf = diamond_rhf
    path = cube.write_density_cube(mf, tmp_path / "rho.cube")
    meta, field = cube.read_cube(path)
    cell = mf.cell
    assert np.array_equal(meta["mesh"], np.asarray(cell.mesh))
    np.testing.assert_allclose(
        meta["voxels"], np.asarray(cell.a) / np.asarray(cell.mesh)[:, None],
        atol=1e-6)
    assert len(meta["atoms"]) == cell.natm
    # carbon with GTH pseudo: Z=6 in the element column, zion=4 as charge
    assert meta["atoms"][0][0] == 6
    np.testing.assert_allclose(meta["atoms"][0][1], 4.0)
    vox_vol = abs(np.linalg.det(meta["voxels"]))
    np.testing.assert_allclose(field.sum() * vox_vol, cell.nelectron,
                               rtol=1e-4)
    assert field.min() > -1e-10  # densities are nonnegative


def test_spin_density_channels(diamond_rhf, tmp_path):
    mf0 = diamond_rhf
    mf = KUHF(mf0.cell, mf0.kpts, verbose=0, conv_tol=1e-8, max_cycle=60)
    mf.kernel(dm0=np.stack([mf0.dm, mf0.dm]) * 0.5)
    assert mf.converged
    rho_t = cube.density_on_grid(mf)
    rho_a = cube.density_on_grid(mf, spin=0)
    rho_b = cube.density_on_grid(mf, spin=1)
    rho_d = cube.density_on_grid(mf, spin="diff")
    np.testing.assert_allclose(rho_a + rho_b, rho_t, atol=1e-10)
    np.testing.assert_allclose(rho_a - rho_b, rho_d, atol=1e-10)
    # closed shell: zero spin density
    np.testing.assert_allclose(rho_d, 0.0, atol=1e-6)


def test_mo_cube_normalization(diamond_rhf, tmp_path):
    mf = diamond_rhf
    path = cube.write_mo_cube(mf, tmp_path / "mo.cube", k=0, n=0,
                              part="abs2")
    meta, field = cube.read_cube(path)
    vox_vol = abs(np.linalg.det(meta["voxels"]))
    # C^H S C = 1 and S is the grid quadrature, so the integral is exact
    # up to the 5-digit cube text format
    np.testing.assert_allclose(field.sum() * vox_vol, 1.0, rtol=1e-4)


def test_write_rejects_wrong_size(diamond_rhf, tmp_path):
    mf = diamond_rhf
    with pytest.raises(ValueError):
        cube.write_cube(tmp_path / "bad.cube", mf.cell, np.ones(7))
