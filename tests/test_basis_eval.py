"""GTO evaluator gates (SURVEY.md section 7 step 2).

Oracles, since PySCF is not available in-image:
- grid-quadrature norms / overlaps vs analytic Gaussian integrals (soft
  exponents so the plane-wave quadrature is converged to < 1e-9),
- Bloch periodicity phi_k(r+T) = e^{ikT} phi_k(r) (validates lattice-image
  sums and k-phases jointly, to machine precision),
- gamma-point / k=0 consistency and phi_{-k} = conj(phi_k).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.basis.eval import eval_ao_kpts, eval_ao_gamma, make_evaluator
from fftisdf_tpu.basis.gto import gaussian_int, normalized_coeffs


def soft_shells(lmax=3):
    """Soft (quadrature-friendly) test shells: contracted s + one shell per l."""
    shells = [Shell(l=0, exps=np.array([0.8, 0.3]),
                    coeffs=np.array([[0.4], [0.7]]))]
    for l in range(1, lmax + 1):
        shells.append(Shell(l=l, exps=np.array([0.5 + 0.1 * l]),
                            coeffs=np.array([[1.0]])))
    return shells


def atom_cell(nat=1, lmax=3, box=12.0, mesh=32):
    atoms = [("He", np.full(3, box / 2))]
    if nat == 2:
        atoms.append(("He", np.array([box / 2, box / 2, box / 2 + 3.0])))
    return Cell(
        a=np.diag([box, box, box]),
        atom=atoms,
        basis={"He": soft_shells(lmax)},
        pseudo=None,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def carbon_cell():
    # diamond with p functions, non-orthogonal lattice
    a = 3.567 / 0.52917721092
    lat = (np.ones((3, 3)) - np.eye(3)) * (a / 2)
    return Cell(
        a=lat,
        atom=[("C", np.zeros(3)), ("C", np.full(3, a / 4))],
        basis="gth-szv",
        pseudo="gth-pade",
        mesh=np.array([20, 20, 20]),
        unit="bohr",
        precision=1e-12,
    ).build()


def quad_overlap(cell, ao_g):
    w = cell.vol / ao_g.shape[0]
    return w * np.asarray(ao_g).conj().T @ np.asarray(ao_g)


def lattice_sum_s_overlap(exps, coeffs, lat_diag, sep, nimg=3):
    """Analytic overlap of two contracted s AOs at separation `sep` (z axis),
    lattice-summed over a diagonal cell."""
    c = normalized_coeffs(0, exps, coeffs)[:, 0]
    e = np.asarray(exps)
    total = 0.0
    for i in range(-nimg, nimg + 1):
        for j in range(-nimg, nimg + 1):
            for k in range(-nimg, nimg + 1):
                R = np.array([lat_diag[0] * i, lat_diag[1] * j,
                              sep + lat_diag[2] * k])
                ee = e[:, None] + e[None, :]
                mu = e[:, None] * e[None, :] / ee
                prim = (np.pi / ee) ** 1.5 * np.exp(-mu * (R @ R))
                total += np.einsum("p,q,pq->", c, c, prim) / (4 * np.pi)
    return total


def test_norms_all_l():
    """Unit norm for l=0..3 validates radial norms AND every solid-harmonic
    normalization coefficient."""
    cell = atom_cell(lmax=3)
    ao = eval_ao_gamma(cell, cell.gen_uniform_grids())
    s = quad_overlap(cell, ao)
    # lattice-image self-overlap is tiny for these exponents in a 12-bohr box
    np.testing.assert_allclose(np.diag(s).real, 1.0, atol=5e-7)
    # angular orthogonality across all pairs
    off = s - np.diag(np.diag(s))
    np.testing.assert_allclose(off, 0.0, atol=5e-7)


def test_s_s_overlap_analytic():
    cell = atom_cell(nat=2, lmax=0)
    ao = eval_ao_gamma(cell, cell.gen_uniform_grids())
    s = quad_overlap(cell, ao)
    sh = soft_shells(0)[0]
    s01_ref = lattice_sum_s_overlap(sh.exps, sh.coeffs, [12.0, 12.0, 12.0], 3.0)
    s00_ref = lattice_sum_s_overlap(sh.exps, sh.coeffs, [12.0, 12.0, 12.0], 0.0)
    np.testing.assert_allclose(s[0, 1].real, s01_ref, atol=1e-8)
    np.testing.assert_allclose(s[0, 0].real, s00_ref, atol=1e-8)


def test_bloch_periodicity():
    cell = carbon_cell()
    kpts = cell.get_kpts([2, 2, 2])
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, size=(40, 3)) @ cell.a
    ao0 = np.asarray(eval_ao_kpts(cell, pts, kpts))
    for t in cell.a:
        ao1 = np.asarray(eval_ao_kpts(cell, pts + t, kpts))
        ph = np.exp(1j * kpts @ t)
        np.testing.assert_allclose(ao1, ph[:, None, None] * ao0, atol=1e-10)


def test_gamma_matches_k0():
    cell = carbon_cell()
    pts = cell.gen_uniform_grids([6, 6, 6])
    ao_g = np.asarray(eval_ao_gamma(cell, pts))
    ao_k = np.asarray(eval_ao_kpts(cell, pts, np.zeros((1, 3))))
    np.testing.assert_allclose(ao_k[0].imag, 0, atol=1e-10)
    np.testing.assert_allclose(ao_k[0].real, ao_g, atol=1e-10)


def test_inversion_symmetry_conjugate():
    # phi_{-k} = conj(phi_k) for real AOs
    cell = carbon_cell()
    k = np.array([[0.1, -0.05, 0.2]])
    pts = cell.gen_uniform_grids([5, 5, 5])
    ao_p = np.asarray(eval_ao_kpts(cell, pts, k))
    ao_m = np.asarray(eval_ao_kpts(cell, pts, -k))
    np.testing.assert_allclose(ao_m, ao_p.conj(), atol=1e-10)


def test_evaluator_jit_reuse():
    cell = atom_cell(lmax=1, mesh=8)
    kpts = cell.get_kpts([1, 1, 2])
    fn = make_evaluator(cell, kpts=kpts)
    a = fn(jnp.asarray(cell.gen_uniform_grids([4, 4, 4])))
    b = fn(jnp.asarray(cell.gen_uniform_grids([4, 4, 4])))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 64, 4)  # s + p


def test_eval_ao_numpy_matches_jitted():
    """The host-side f64 evaluator (the f32-device selection path:
    select_host_f64) must agree with the jitted evaluator to f64
    round-off — multi-l shells, off-grid coords, k-phases included."""
    from fftisdf_tpu.lattice import structure

    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=40.0)
    kpts = cell.get_kpts([1, 2, 2])
    rng = np.random.default_rng(5)
    coords = rng.uniform(-2.0, 8.0, size=(37, 3))
    from fftisdf_tpu.basis.eval import eval_ao_kpts, eval_ao_numpy
    ref = np.asarray(eval_ao_kpts(cell, coords, kpts))
    out = eval_ao_numpy(cell, coords, kpts=kpts)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-12)
    # gamma path
    ref_g = np.asarray(eval_ao_kpts(cell, coords, cell.get_kpts([1, 1, 1])))
    out_g = eval_ao_numpy(cell, coords, kpts=None)
    np.testing.assert_allclose(out_g, ref_g[0].real, rtol=0, atol=1e-12)
