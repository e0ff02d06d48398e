import numpy as np
import pytest

from fftisdf_tpu.lattice.cell import Cell, cartesian_prod
from fftisdf_tpu.lattice import kpoints, structure


def he2_cell(mesh=(10, 10, 10)):
    return Cell(
        a=np.diag([2.0, 2.0, 6.0]),
        atom=[("He", (1.0, 1.0, 2.0)), ("He", (1.0, 1.0, 4.0))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.asarray(mesh),
        unit="bohr",
    ).build()


def test_cartesian_prod_order():
    out = cartesian_prod([np.arange(2), np.arange(3)])
    assert out.shape == (6, 2)
    # last axis fastest
    assert np.array_equal(out[:3, 1], [0, 1, 2])
    assert np.array_equal(out[:3, 0], [0, 0, 0])


def test_reciprocal_vectors():
    cell = he2_cell()
    b = cell.reciprocal_vectors()
    np.testing.assert_allclose(cell.a @ b.T, 2 * np.pi * np.eye(3), atol=1e-12)


def test_uniform_grid_layout_matches_fftn():
    cell = he2_cell(mesh=(4, 5, 6))
    coords = cell.gen_uniform_grids()
    assert coords.shape == (4 * 5 * 6, 3)
    # g = (ix*my + iy)*mz + iz; check a few entries
    frac = coords @ np.linalg.inv(cell.a)
    idx = np.round(frac * np.array([4, 5, 6])).astype(int)
    g = (idx[:, 0] * 5 + idx[:, 1]) * 6 + idx[:, 2]
    assert np.array_equal(g, np.arange(4 * 5 * 6))


def test_gv_matches_fft_frequencies():
    cell = he2_cell(mesh=(4, 5, 6))
    gv = cell.get_Gv()
    # plane wave exp(iG.r) sampled on the grid must be exactly an FFT basis
    coords = cell.gen_uniform_grids()
    f = np.exp(1j * coords @ gv[7])
    spec = np.fft.fftn(f.reshape(4, 5, 6)).reshape(-1)
    expect = np.zeros_like(spec)
    expect[7] = f.size
    np.testing.assert_allclose(spec, expect, atol=1e-8)


def test_kpts_and_kmesh_roundtrip():
    cell = he2_cell()
    kmesh = [2, 2, 3]
    kpts = cell.get_kpts(kmesh)
    assert kpts.shape == (12, 3)
    assert np.array_equal(kpoints.kpts_to_kmesh(cell, kpts), kmesh)


def test_phase_unitary():
    cell = he2_cell()
    kmesh = [2, 3, 2]
    kpts = cell.get_kpts(kmesh)
    phase = kpoints.get_phase(cell, kpts, kmesh)
    nk = len(kpts)
    np.testing.assert_allclose(phase.conj().T @ phase, np.eye(nk), atol=1e-12)
    np.testing.assert_allclose(phase @ phase.conj().T, np.eye(nk), atol=1e-12)


def test_kconserv_tables():
    cell = he2_cell()
    kpts = cell.get_kpts([2, 2, 2])
    s = cell.get_scaled_kpts(kpts)
    k2 = kpoints.get_kconserv2(cell, kpts)
    k3 = kpoints.get_kconserv3(cell, kpts)
    nk = len(kpts)
    for k1 in range(nk):
        for kk2 in range(nk):
            q = k2[k1, kk2]
            d = s[kk2] - s[k1] - s[q]
            np.testing.assert_allclose(d - np.rint(d), 0, atol=1e-10)
            for kk3 in range(nk):
                k4 = k3[k1, kk2, kk3]
                d = s[k1] - s[kk2] + s[kk3] - s[k4]
                np.testing.assert_allclose(d - np.rint(d), 0, atol=1e-10)


def test_poscar_roundtrip():
    lat, atoms = structure.nio_afm()
    text = structure.format_poscar(lat, atoms)
    lat2, atoms2 = structure.parse_poscar(text)
    np.testing.assert_allclose(lat, lat2, atol=1e-8)
    assert [s for s, _ in atoms2] == ["Ni", "Ni", "O", "O"]
    np.testing.assert_allclose(
        np.array([x for _, x in atoms]), np.array([x for _, x in atoms2]), atol=1e-8
    )


def test_poscar_direct_coords():
    text = """test
1.0
 4.0 0.0 0.0
 0.0 4.0 0.0
 0.0 0.0 4.0
C O
1 1
Direct
 0.25 0.25 0.25
 0.5 0.5 0.5
"""
    lat, atoms = structure.parse_poscar(text)
    np.testing.assert_allclose(atoms[0][1], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(atoms[1][1], [2.0, 2.0, 2.0])


def test_bulk_builders():
    lat, atoms = structure.bulk_diamond()
    assert len(atoms) == 2
    assert abs(np.linalg.det(lat)) > 0
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    assert cell.nao_nr() == 8  # 2 atoms x (s + p) = 2 * 4
    assert (cell.mesh > 0).all()


def test_cutoff_to_mesh_covers_sphere():
    cell = he2_cell()
    mesh = cell.cutoff_to_mesh(50.0)
    gv = cell.get_Gv(mesh)
    # max |G| along each axis must exceed sqrt(2*ke)
    gmax = np.sqrt(2 * 50.0)
    assert np.abs(gv).max() >= gmax / np.sqrt(3)
