"""Atom-centered (Becke) grid gates.

Oracle: integrating normalized Gaussian densities centered on the atoms over
the cell must give the electron count (periodic images included via the
partition construction).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.lattice.becke import (
    AtomCenteredGrids, radial_becke, angular_product)


def test_radial_quadrature():
    # int_0^inf r^2 e^{-a r^2} dr = sqrt(pi)/(4 a^{3/2})
    r, w = radial_becke(60, 1.0)
    for a in (0.5, 1.0, 3.0):
        val = np.sum(w * np.exp(-a * r ** 2))
        ref = np.sqrt(np.pi) / (4 * a ** 1.5)
        np.testing.assert_allclose(val, ref, rtol=1e-8)


def test_angular_quadrature():
    pts, w = angular_product(8)
    np.testing.assert_allclose(w.sum(), 4 * np.pi, rtol=1e-12)
    # exact for low-order polynomials on the sphere
    np.testing.assert_allclose(np.sum(w * pts[:, 2] ** 2), 4 * np.pi / 3,
                               rtol=1e-10)
    np.testing.assert_allclose(np.sum(w * pts[:, 0] * pts[:, 1]), 0.0,
                               atol=1e-12)


def test_becke_integrates_gaussian_density():
    cell = Cell(
        a=np.diag([6.0, 6.0, 8.0]),
        atom=[("He", (3.0, 3.0, 2.5)), ("He", (3.0, 3.0, 5.5))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([8, 8, 10]),
        unit="bohr",
    ).build()
    grids = AtomCenteredGrids(cell, level=2).build()
    # periodic density: sum over atoms and images of normalized Gaussians
    alphas = (0.8, 1.6)
    dens = np.zeros(len(grids.coords))
    a = np.asarray(cell.a)
    for (sym, xyz), al in zip(cell.atom, alphas):
        for i in range(-2, 3):
            for j in range(-2, 3):
                for k in range(-2, 3):
                    c = np.asarray(xyz) + i * a[0] + j * a[1] + k * a[2]
                    d2 = np.sum((grids.coords - c) ** 2, axis=1)
                    dens += (al / np.pi) ** 1.5 * np.exp(-al * d2)
    n = np.sum(grids.weights * dens)
    np.testing.assert_allclose(n, 2.0, atol=5e-4)


def test_lsthc_on_becke_grids():
    """LSTHC with atom-centered grids (the reference's BeckeGrids usage,
    k_least_square.py:89-90)."""
    from fftisdf_tpu.isdf.thc import LSTHC

    cell = Cell(
        a=np.diag([5.0, 5.0, 7.0]),
        atom=[("He", (2.5, 2.5, 2.0)), ("He", (2.5, 2.5, 4.5))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([9, 9, 11]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts([1, 1, 2])
    grids = AtomCenteredGrids(cell, level=0).build()
    thc = LSTHC(cell, kpts, verbose=0, grids=grids).build()
    report = thc.error_report()
    for (k1, k2, err1, err2) in report:
        assert err1 < 5e-5, (k1, k2, err1)
