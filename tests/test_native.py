"""Native C++ lattice engine vs the pure-Python fallbacks."""
import os

import numpy as np
import pytest

from fftisdf_tpu import native
from fftisdf_tpu.lattice.cell import Cell
from fftisdf_tpu.lattice import kpoints


def test_native_builds():
    lib = native.load()
    assert lib is not None, "g++ toolchain expected in this environment"


def triclinic_cell():
    return Cell(
        a=np.array([[4.0, 0.3, 0.0], [0.1, 4.5, 0.2], [0.0, 0.4, 5.0]]),
        atom=[("He", (1.0, 1.2, 2.0))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([4, 4, 4]),
        unit="bohr",
    ).build()


def test_enumerate_images_matches_python():
    cell = triclinic_cell()
    a = np.asarray(cell.a)
    center = np.array([1.0, 1.2, 2.0])
    ccenter = a.sum(axis=0) / 2
    reach = 9.3
    vol = abs(np.linalg.det(a))
    heights = np.array([
        vol / np.linalg.norm(np.cross(a[(i + 1) % 3], a[(i + 2) % 3]))
        for i in range(3)
    ])
    nmax = np.ceil((reach + np.linalg.norm(center - ccenter)) / heights
                   ).astype(int) + 1
    ts_native = native.enumerate_images(a, center, ccenter, reach, nmax)
    assert ts_native is not None
    rng = [np.arange(-n, n + 1) for n in nmax]
    ints = np.stack(np.meshgrid(*rng, indexing="ij"), -1).reshape(-1, 3)
    ts_py = ints.astype(float) @ a
    ts_py = ts_py[np.linalg.norm(center + ts_py - ccenter, axis=1) <= reach]
    # same set (ordering is the same nested-loop order)
    assert ts_native.shape == ts_py.shape
    np.testing.assert_allclose(np.sort(ts_native, axis=0),
                               np.sort(ts_py, axis=0), atol=1e-12)


def test_kconserv_matches_python():
    cell = triclinic_cell()
    kpts = cell.get_kpts([2, 3, 2])
    s = cell.get_scaled_kpts(kpts)
    tables = native.build_kconserv(s)
    assert tables is not None
    k2n, k3n = tables
    nk = len(kpts)
    # python reference
    k2p = np.empty((nk, nk), dtype=np.int64)
    k3p = np.empty((nk, nk, nk), dtype=np.int64)
    for i in range(nk):
        for j in range(nk):
            k2p[i, j] = kpoints.member(s[j] - s[i], s)
            for k in range(nk):
                k3p[i, j, k] = kpoints.member(s[i] - s[j] + s[k], s)
    assert np.array_equal(k2n, k2p)
    assert np.array_equal(k3n, k3p)


def test_ewald_real_matches_python():
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 4, (5, 3))
    charges = rng.uniform(-2, 2, 5)
    ts = np.stack(np.meshgrid(*[np.arange(-2, 3) * 4.0] * 3,
                              indexing="ij"), -1).reshape(-1, 3)
    eta = 0.3
    e_native = native.ewald_real(coords, charges, ts, eta)
    assert e_native is not None
    from fftisdf_tpu.scf.integrals import _ewald_real_py

    e_py = _ewald_real_py(coords, charges, ts, eta)
    np.testing.assert_allclose(e_native, e_py, atol=1e-10)
