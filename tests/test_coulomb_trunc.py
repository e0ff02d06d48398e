"""Truncated Coulomb kernels for low-dimensional systems (0D/2D).

Capability BEYOND the reference (strictly 3D-periodic): real-space
truncation removes the spurious periodic-image coupling along non-periodic
directions (linalg.coulomb module docstring for the formulas and citations).

Gates:
- analytic kernel values and branch consistency (Gp->0, Gz->0, mesh
  frequencies, evenness in q+G),
- a free-space physics oracle: the 0D-truncated grid Hartree self-energy of
  an isolated Gaussian matches the analytic free-space value where the bare
  periodic kernel carries O(1/L) image errors,
- full-rank FFTISDF(trunc=...) reproduces the truncated exact plane-wave
  J/K (0D, and 2D whose q+G=0 sample is NEGATIVE — exercising the
  signed-metric rank-1 correction in the fused build),
- sharded build agreement (the vmapped ``signed`` path),
- save/load round-trip carries the truncation spec,
- omega/exxdiv composition guards.
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.linalg.coulomb import (
    get_coulG, check_trunc, trunc_for_cell)
from fftisdf_tpu.linalg.fft import fft3
from fftisdf_tpu.pw import get_jk_kpts


# ---------------------------------------------------------------------
# kernel values
# ---------------------------------------------------------------------

def test_trunc_0d_analytic_values():
    rc = 3.0
    cell = Cell(a=np.eye(3) * 8.0, atom=[("He", (4.0, 4.0, 4.0))],
                basis="sto-3g", pseudo=None, mesh=np.array([9, 9, 9]),
                unit="bohr").build()
    gv = np.asarray(cell.get_Gv(cell.mesh))
    v = np.asarray(get_coulG(cell, mesh=cell.mesh, trunc=("0d", rc)))
    absg2 = np.einsum("gi,gi->g", gv, gv)
    i0 = int(np.argmin(absg2))
    # finite q+G=0 value 2 pi rc^2 (Spencer-Alavi)
    assert abs(v[i0] - 2.0 * np.pi * rc * rc) < 1e-12
    # analytic form elsewhere
    g = np.sqrt(absg2)
    mask = absg2 > 1e-12
    ref = 4.0 * np.pi * (1.0 - np.cos(g[mask] * rc)) / absg2[mask]
    assert abs(v[mask] - ref).max() < 1e-10
    # rc -> infinity recovers the bare kernel in the average sense: at a
    # fixed G the truncated value oscillates about 4 pi / G^2 with the
    # cos(G rc) term; check the envelope midpoint
    rcs = np.array([50.0, 50.0 + np.pi / g[mask][0]])
    pair = [np.asarray(get_coulG(cell, mesh=cell.mesh, trunc=("0d", r)))
            for r in rcs]
    mid = (pair[0][mask][0] + pair[1][mask][0]) / 2
    assert abs(mid - 4.0 * np.pi / absg2[mask][0]) < 1e-8


def test_trunc_2d_branch_consistency():
    """The three 2D branches agree in their shared limits."""
    rc = 4.0
    pi4 = 4.0 * np.pi

    def v2d(gx, gy, gz):
        gk = jnp.asarray([[gx, gy, gz]], dtype=jnp.float64)
        from fftisdf_tpu.linalg.coulomb import _coulG_vec
        return float(np.asarray(_coulG_vec(gk, 0.0, ("2d", rc)))[0])

    # Gp -> 0 continuity holds ONLY at mesh frequencies Gz rc = pi n (the
    # (Gz/Gp) sin(Gz rc) term is a genuine divergence of the truncated
    # kernel's Fourier transform at off-mesh Gz); a physical 2D system
    # keeps Gz on mesh (in-plane k-sampling)
    for n in (1, 2):
        gz = np.pi * n / rc
        lim = pi4 / gz**2 * (1.0 - np.cos(gz * rc)
                             - gz * rc * np.sin(gz * rc))
        assert abs(v2d(1e-6, 0.0, gz) - lim) < 1e-8
        assert abs(v2d(0.0, 0.0, gz) - lim) < 1e-12
    # Gz = 0, Gp > 0: 4 pi / Gp^2 (1 - exp(-Gp rc))
    gp = 0.9
    assert abs(v2d(gp, 0.0, 0.0)
               - pi4 / gp**2 * (1.0 - np.exp(-gp * rc))) < 1e-12
    # mesh frequency Gz rc = pi n: weight reduces to 1 - (-1)^n e^{-Gp rc}
    for n in (1, 2):
        gz = np.pi * n / rc
        g2 = gp * gp + gz * gz
        ref = pi4 / g2 * (1.0 - (-1.0) ** n * np.exp(-gp * rc))
        assert abs(v2d(gp, 0.0, gz) - ref) < 1e-12
    # q+G = 0: the NEGATIVE finite value -2 pi rc^2 (Ismail-Beigi)
    assert abs(v2d(0.0, 0.0, 0.0) + 2.0 * np.pi * rc * rc) < 1e-12
    # evenness in q+G (needed by the build's time-reversal halving)
    for g in ([0.3, -0.5, 0.9], [0.0, 0.0, 1.1], [0.2, 0.1, 0.0]):
        assert abs(v2d(*g) - v2d(*[-x for x in g])) < 1e-14


def test_trunc_for_cell_radii():
    cell = Cell(a=np.diag([6.0, 8.0, 10.0]), atom=[("He", (3.0, 4.0, 5.0))],
                basis="sto-3g", pseudo=None, mesh=np.array([9, 9, 9]),
                unit="bohr").build()
    kind, rc = trunc_for_cell(cell, "0d")
    assert kind == "0d" and abs(rc - 3.0) < 1e-12
    kind, rc = trunc_for_cell(cell, "2d")
    assert kind == "2d" and abs(rc - 5.0) < 1e-12


def test_trunc_omega_guard():
    with pytest.raises(NotImplementedError):
        check_trunc(("0d", 3.0), omega=0.3)


# ---------------------------------------------------------------------
# free-space physics oracle
# ---------------------------------------------------------------------

def test_trunc_0d_gaussian_hartree_free_space():
    """Grid Hartree self-energy of an isolated normalized Gaussian with the
    0D-truncated kernel matches the analytic free-space value 1/(2 sqrt(pi)
    sigma); the bare periodic kernel (background-subtracted G=0) is off by
    the O(1/L) image/background term."""
    sigma = 0.6
    L = 10.0
    n = 25
    mesh = (n, n, n)
    cell = Cell(a=np.eye(3) * L, atom=[("He", (L / 2,) * 3)],
                basis="sto-3g", pseudo=None, mesh=np.array(mesh),
                unit="bohr").build()
    coords = np.asarray(cell.gen_uniform_grids())
    r2 = np.sum((coords - L / 2) ** 2, axis=1)
    rho = np.exp(-r2 / (2 * sigma * sigma))
    rho /= rho.sum() * (L**3 / n**3)        # unit charge on the grid

    def hartree(coulG):
        rho_g = np.asarray(fft3(jnp.asarray(rho)[None], mesh))[0]
        ng = n**3
        # E = 1/(2 vol) sum_G |rho(G)|^2 v(G), rho(G) = vol/ng * FFT(rho)
        return 0.5 / L**3 * float(
            np.sum(np.abs(rho_g * (L**3 / ng)) ** 2 * np.asarray(coulG)))

    e_ref = 1.0 / (2.0 * math.sqrt(math.pi) * sigma)
    e_tr = hartree(get_coulG(cell, mesh=mesh, trunc=("0d", L / 2)))
    e_bare = hartree(get_coulG(cell, mesh=mesh))
    assert abs(e_tr - e_ref) < 1e-6, f"truncated: {e_tr} vs {e_ref}"
    # the bare-kernel (jellium-background) error is the Madelung-like
    # O(1/L) term — orders of magnitude above the truncated error
    assert abs(e_bare - e_ref) > 1e-2


# ---------------------------------------------------------------------
# ISDF gates (full rank == exactness regime)
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def he2_box():
    cell = Cell(
        a=np.diag([7.0, 7.0, 8.0]),
        atom=[("He", (3.5, 3.5, 3.2)), ("He", (3.5, 3.5, 4.8))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([15, 15, 17]),
        unit="bohr",
        precision=1e-12,
    ).build()
    return cell


def _full_rank_isdf(cell, kpts, trunc):
    df = FFTISDF(cell, kpts, c0=50.0, m0=tuple(cell.mesh), verbose=0,
                 select_tol=1e-20, rcond=1e-13, trunc=trunc)
    return df.build()


def _dm_for(cell, kpts, ao, seed=0):
    from tests.test_isdf_kpoint import trs_dm
    return trs_dm(cell, kpts, ao.shape[2], seed=seed)[0]


def test_isdf_trunc_0d_jk_exact(he2_box):
    cell = he2_box
    kpts = cell.get_kpts([1, 1, 1])
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    df = _full_rank_isdf(cell, kpts, "0d")
    assert df.trunc[0] == "0d" and abs(df.trunc[1] - 3.5) < 1e-10
    dm = _dm_for(cell, kpts, ao)
    vj_ref, vk_ref = get_jk_kpts(cell, jnp.asarray(dm), jnp.asarray(ao),
                                 kpts, trunc=df.trunc)
    vj, vk = df.get_jk(dm)
    assert abs(np.asarray(vj) - np.asarray(vj_ref)).max() < 1e-9
    assert abs(np.asarray(vk) - np.asarray(vk_ref)).max() < 1e-9
    # and the truncated result genuinely differs from the bare-kernel one
    vj_b, vk_b = get_jk_kpts(cell, jnp.asarray(dm), jnp.asarray(ao), kpts)
    assert abs(np.asarray(vj) - np.asarray(vj_b)).max() > 1e-4


def test_isdf_trunc_2d_jk_exact(he2_box):
    """2D slab truncation with in-plane k-sampling: the q=0 sector's
    q+G=0 kernel sample is NEGATIVE (-2 pi rc^2), exercising the fused
    build's neg_cols rank-1 gram correction."""
    cell = he2_box
    kpts = cell.get_kpts([2, 1, 1])
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    df = _full_rank_isdf(cell, kpts, "2d")
    assert df.trunc[0] == "2d" and abs(df.trunc[1] - 4.0) < 1e-10
    # the negative sample really is in play
    cg0 = np.asarray(get_coulG(cell, mesh=cell.mesh, trunc=df.trunc))
    assert cg0.min() < -1e-8
    dm = _dm_for(cell, kpts, ao)
    vj_ref, vk_ref = get_jk_kpts(cell, jnp.asarray(dm), jnp.asarray(ao),
                                 kpts, trunc=df.trunc)
    vj, vk = df.get_jk(dm)
    assert abs(np.asarray(vj) - np.asarray(vj_ref)).max() < 1e-9
    assert abs(np.asarray(vk) - np.asarray(vk_ref)).max() < 1e-9


def test_trunc_exxdiv_0d_noop(he2_box):
    """The 0D kernel's probe-charge correction is exactly zero
    (integrals.madelung_trunc), so exxdiv='ewald' is a no-op on a
    0D-truncated factorization."""
    cell = he2_box
    kpts = cell.get_kpts([1, 1, 1])
    df = _full_rank_isdf(cell, kpts, "0d")
    assert df.madelung() == 0.0
    dm = np.eye(df.x_k.shape[2])[None].astype(float)
    vj0, vk0 = df.get_jk(dm)
    vj1, vk1 = df.get_jk(dm, exxdiv="ewald")
    assert abs(np.asarray(vk1) - np.asarray(vk0)).max() < 1e-12


def test_trunc_serialization_roundtrip(tmp_path, he2_box):
    cell = he2_box
    kpts = cell.get_kpts([1, 1, 1])
    df = _full_rank_isdf(cell, kpts, "0d")
    path = str(tmp_path / "trunc_state.npz")
    df.save(path)
    df2 = FFTISDF.load(path, cell, kpts)
    assert df2.trunc == df.trunc
    ao = np.asarray(eval_ao_kpts(cell, cell.gen_uniform_grids(), kpts))
    dm = _dm_for(cell, kpts, ao)
    vj1, vk1 = df.get_jk(dm)
    vj2, vk2 = df2.get_jk(dm)
    assert abs(np.asarray(vj1) - np.asarray(vj2)).max() < 1e-12
    assert abs(np.asarray(vk1) - np.asarray(vk2)).max() < 1e-12


def test_sharded_build_trunc_matches_single(he2_box):
    """Sharded (signed vmapped _sector_wq) vs single-chip (neg_cols fused
    gram) builds agree on a 2D-truncated metric."""
    from fftisdf_tpu.parallel import make_device_mesh, build_sharded

    cell = he2_box
    kpts = cell.get_kpts([2, 1, 1])
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    df = FFTISDF(cell, kpts, c0=10.0, m0=(9, 9, 11), verbose=0,
                 trunc="2d").build()
    df2 = FFTISDF(cell, kpts, c0=10.0, m0=(9, 9, 11), verbose=0,
                  trunc="2d")
    build_sharded(df2, make_device_mesh())
    dm = _dm_for(cell, kpts, ao)
    vj1, vk1 = df.get_jk(dm)
    vj2, vk2 = df2.get_jk(dm)
    np.testing.assert_allclose(np.asarray(vj1), np.asarray(vj2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vk1), np.asarray(vk2), atol=1e-6)
