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


def test_eval_ao_group_matches_numpy_fallback():
    """Native screened AO evaluation agrees with the dense numpy
    formulation to far below the evaluator's 1e-12 contract (the
    screening margin keeps skipped image contributions ~4 orders
    smaller)."""
    from fftisdf_tpu.lattice import structure
    from fftisdf_tpu.basis.eval import build_shell_table, _group_by_center

    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-dzvp",
                             pseudo="gth-pade", ke_cutoff=40.0)
    kpts = cell.get_kpts([1, 2, 2])
    rng = np.random.default_rng(3)
    coords = rng.uniform(0.0, 6.0, size=(53, 3))
    table = build_shell_table(cell, None)
    groups = _group_by_center(cell, table, None)
    group = groups[0]
    centers = group.center[None, :] + group.images
    t = group.images @ np.asarray(kpts).T
    out_n = native.eval_ao_group(coords, centers, np.cos(t), np.sin(t),
                                 group.specs,
                                 screen_precision=cell.precision * 1e-4)
    assert out_n is not None
    # dense reference (all images, no screening)
    from fftisdf_tpu.basis.gto import real_solid_harmonics
    d = coords[:, None, :] - centers[None, :, :]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    r2 = dx * dx + dy * dy + dz * dz
    feats = []
    for spec in group.specs:
        rad = np.exp(-r2[..., None] * spec.exps) @ spec.coeffs
        for _ in range(spec.rpow):
            rad = rad * r2[..., None]
        ang = np.stack(real_solid_harmonics(dx, dy, dz, spec.l, np), axis=-1)
        chi = rad[..., None, :] * ang[..., :, None]
        feats.append(chi.reshape(r2.shape + (spec.nfunc,)))
    chi_all = np.concatenate(feats, axis=-1)
    ref = np.moveaxis(
        np.tensordot(chi_all, np.cos(t), axes=([1], [0]))
        + 1j * np.tensordot(chi_all, np.sin(t), axes=([1], [0])), 2, 0)
    np.testing.assert_allclose(out_n, ref, rtol=0, atol=1e-13)
