"""SCF checkpoint/restart gates (utils.serialization.save_scf/load_scf).

- round trip preserves energies, dm, orbitals, convergence flag;
- a warm restart from the checkpoint dm reconverges to the same energy
  in a couple of cycles;
- geometry validation rejects mismatched meshes / k-points.
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import KRHF, KUHF
from fftisdf_tpu.utils.serialization import load_scf, save_scf


@pytest.fixture(scope="module")
def diamond_rhf():
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-9)
    mf.kernel()
    assert mf.converged
    return mf


def test_roundtrip(diamond_rhf, tmp_path):
    mf = diamond_rhf
    path = str(tmp_path / "scf.npz")
    mf.save(path)
    data = load_scf(path, cell=mf.cell, kpts=mf.kpts)
    assert data["driver"] == "KRHF"
    assert data["converged"]
    np.testing.assert_allclose(data["e_tot"], mf.e_tot, atol=1e-14)
    np.testing.assert_allclose(data["dm"], mf.dm, atol=1e-14)
    np.testing.assert_allclose(data["mo_energy"], mf.mo_energy, atol=1e-14)
    np.testing.assert_allclose(data["mo_occ"], mf.mo_occ, atol=1e-14)


def test_warm_restart(diamond_rhf, tmp_path):
    mf = diamond_rhf
    path = str(tmp_path / "scf.npz")
    mf.save(path)
    mf2 = KRHF(mf.cell, mf.kpts, verbose=0, conv_tol=1e-9, max_cycle=3)
    e2 = mf2.kernel(dm0=mf2.load_chk(path))
    assert mf2.converged
    np.testing.assert_allclose(e2, mf.e_tot, atol=1e-9)


def test_geometry_validation(diamond_rhf, tmp_path):
    mf = diamond_rhf
    path = str(tmp_path / "scf.npz")
    mf.save(path)
    with pytest.raises(ValueError, match="k-points"):
        load_scf(path, kpts=mf.kpts + 0.1)
    cell2 = mf.cell.copy(mesh=np.asarray(mf.cell.mesh) + 2).build()
    with pytest.raises(ValueError, match="mesh"):
        load_scf(path, cell=cell2)


def test_unrestricted_checkpoint(diamond_rhf, tmp_path):
    mf0 = diamond_rhf
    mf = KUHF(mf0.cell, mf0.kpts, verbose=0, conv_tol=1e-8, max_cycle=60)
    mf.kernel(dm0=np.stack([mf0.dm, mf0.dm]) * 0.5)
    assert mf.converged
    path = str(tmp_path / "uscf.npz")
    mf.save(path)
    data = load_scf(path)
    assert data["driver"] == "KUHF"
    assert data["dm"].shape == (2,) + mf0.dm.shape
    np.testing.assert_allclose(data["e_tot"], mf.e_tot, atol=1e-14)
