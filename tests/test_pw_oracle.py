"""Exact plane-wave (FFTDF-equivalent) oracle gates.

The absolute-scale anchor: for a single normalized s Gaussian in a cubic box
of side L (with the G=0 component zeroed, i.e. exxdiv=None),

    (aa|aa)_pbc = 2 sqrt(alpha/pi) - madelung/L + O(exp(-alpha L^2/2))

with the cubic-lattice point-charge-with-background Madelung constant
2.8372974794806.  This catches any global vol/ngrid/FFT-normalization error.
The remaining gates are exact symmetries.
"""
import numpy as np
import jax.numpy as jnp

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.basis.eval import eval_ao_kpts, eval_ao_gamma
from fftisdf_tpu.pw import get_eri_from_ao, get_jk_kpts
from fftisdf_tpu.pw.jk import get_j_kpts, get_k_kpts

MADELUNG_CUBIC = 2.8372974794806


def gaussian_cell(alpha=1.5, L=10.0, mesh=24):
    shells = [Shell(l=0, exps=np.array([alpha]), coeffs=np.array([[1.0]]))]
    return Cell(
        a=np.eye(3) * L,
        atom=[("He", np.full(3, L / 2))],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_eri_absolute_scale():
    """(aa|aa) for one normalized s Gaussian, two independent analytic oracles:

    1. closed form: 2 sqrt(alpha/pi) - madelung/L + pi/(alpha vol)
       (molecular self-repulsion + point-charge Madelung + G=0
       Gaussian-width correction, all standard Ewald pieces);
    2. direct reciprocal-lattice sum (4 pi/vol) sum_{G/=0} e^{-G^2/(4 alpha)... }
       of the Gaussian density form factors — no FFT machinery shared with
       the code under test.
    """
    alpha, L = 1.5, 10.0
    cell = gaussian_cell(alpha, L, mesh=40)
    coords = cell.gen_uniform_grids()
    ao = eval_ao_gamma(cell, coords).astype(jnp.complex128)
    eri = np.asarray(get_eri_from_ao(cell, (ao, ao, ao, ao), np.zeros(3)))
    vol = L ** 3
    ref1 = (2 * np.sqrt(alpha / np.pi) - MADELUNG_CUBIC / L
            + np.pi / (alpha * vol))
    # direct G-sum: density rho(G) form factor of |chi|^2 is e^{-G^2/(8 alpha)}
    # squared in the Coulomb sum -> e^{-G^2/(4 alpha)}
    n = np.arange(-40, 41)
    gx = 2 * np.pi / L * n
    G2 = (gx[:, None, None] ** 2 + gx[None, :, None] ** 2
          + gx[None, None, :] ** 2).reshape(-1)
    G2 = G2[G2 > 1e-12]
    ref2 = (4 * np.pi / vol) * np.sum(np.exp(-G2 / (4 * alpha)) / G2)
    np.testing.assert_allclose(ref1, ref2, atol=1e-6)
    np.testing.assert_allclose(eri[0, 0, 0, 0].real, ref2, atol=5e-6)
    np.testing.assert_allclose(eri[0, 0, 0, 0].imag, 0.0, atol=1e-12)


def he2_cell():
    # odd mesh: the FFT G-set is inversion symmetric, so q -> -q symmetries
    # hold to machine precision (even meshes carry the unmatched -N/2 plane
    # wave and break them at the grid-truncation level, ~1e-6 here)
    return Cell(
        a=np.diag([6.0, 6.0, 9.0]),
        atom=[("He", (3.0, 3.0, 3.0)), ("He", (3.0, 3.0, 6.0))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([21, 21, 25]),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_eri_symmetries_kpts():
    cell = he2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    # quadruple (k1,k2,k3,k4) = (0,1,1,0): q = k2 - k1 = kpts[1]
    q = kpts[1] - kpts[0]
    eri = np.asarray(get_eri_from_ao(
        cell, (ao[0], ao[1], ao[1], ao[0]), q, coords))
    # swap pair (12)<->(34): (34|12) with q -> -q must be the transpose
    eri_swap = np.asarray(get_eri_from_ao(
        cell, (ao[1], ao[0], ao[0], ao[1]), -q, coords))
    np.testing.assert_allclose(
        eri_swap, eri.transpose(2, 3, 0, 1), atol=1e-10)
    # hermiticity: conj of (k1 m, k2 n | ...) equals index swap with k1<->k2
    eri_conj = np.asarray(get_eri_from_ao(
        cell, (ao[1], ao[0], ao[0], ao[1]), -q, coords))
    np.testing.assert_allclose(
        eri.conj(), eri_conj.transpose(1, 0, 3, 2), atol=1e-10)


def test_gamma_eri_real_and_symmetric():
    cell = he2_cell()
    coords = cell.gen_uniform_grids()
    ao = eval_ao_gamma(cell, coords).astype(jnp.complex128)
    eri = np.asarray(get_eri_from_ao(cell, (ao, ao, ao, ao), np.zeros(3)))
    np.testing.assert_allclose(eri.imag, 0, atol=1e-10)
    e = eri.real
    np.testing.assert_allclose(e, e.transpose(1, 0, 2, 3), atol=1e-10)
    np.testing.assert_allclose(e, e.transpose(2, 3, 0, 1), atol=1e-10)


def test_jk_single_orbital_consistency():
    # one orbital, dm = [[1]]: vj == vk == (aa|aa)
    alpha, L = 1.2, 9.0
    cell = gaussian_cell(alpha, L, mesh=24)
    kpts = np.zeros((1, 3))
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    dm = np.ones((1, 1, 1), dtype=complex)
    vj, vk = get_jk_kpts(cell, jnp.asarray(dm), jnp.asarray(ao), kpts)
    eri = np.asarray(get_eri_from_ao(
        cell, (ao[0], ao[0], ao[0], ao[0]), np.zeros(3), coords))
    np.testing.assert_allclose(np.asarray(vj)[0, 0, 0], eri[0, 0, 0, 0],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(vk)[0, 0, 0], eri[0, 0, 0, 0],
                               atol=1e-9)


def test_k_matches_eri_contraction():
    # vk[k1]_{mn} = (1/nk) sum_{k2,ls} dm[k2]_{ls} eri(k1 m, k2 l | k2 s, k1 n)
    cell = he2_cell()
    kmesh = [1, 1, 2]
    kpts = cell.get_kpts(kmesh)
    nk = len(kpts)
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    rng = np.random.default_rng(0)
    nao = ao.shape[2]
    dm = rng.standard_normal((nk, nao, nao))
    dm = dm + dm.transpose(0, 2, 1)  # hermitian
    dm = jnp.asarray(dm + 0j)
    vk = np.asarray(get_k_kpts(cell, dm, jnp.asarray(ao), kpts))
    vk_ref = np.zeros((nk, nao, nao), dtype=complex)
    for k1 in range(nk):
        for k2 in range(nk):
            q = kpts[k2] - kpts[k1]
            eri = np.asarray(get_eri_from_ao(
                cell, (ao[k1], ao[k2], ao[k2], ao[k1]), q, coords))
            vk_ref[k1] += np.einsum("ls,mlsn->mn", np.asarray(dm[k2]), eri) / nk
    np.testing.assert_allclose(vk, vk_ref, atol=1e-8)


def test_k_row_blocking_exact():
    """Bra-row blocking of the exact-K pair density (row_block) is an exact
    reorganization: forced small blocks (with padding remainder) must match
    the single-block path to machine precision.  The blocking is what lets
    the production-cutoff oracle (NiO dzvp ke=200: 7.7 GB pair density)
    fit device memory at all."""
    rng = np.random.default_rng(3)
    cell = gaussian_cell(alpha=1.2, L=8.0, mesh=12)
    # 3 AOs -> row_block=2 exercises the padded remainder block
    shells = [Shell(l=0, exps=np.array([1.2]), coeffs=np.array([[1.0]])),
              Shell(l=1, exps=np.array([0.8]), coeffs=np.array([[1.0]]))]
    cell = Cell(a=np.eye(3) * 8.0, atom=[("He", np.full(3, 4.0))],
                basis={"He": shells}, pseudo=None,
                mesh=np.array([12] * 3), unit="bohr",
                precision=1e-12).build()
    kpts = cell.get_kpts([1, 2, 1])
    nk, nao = len(kpts), cell.nao_nr()
    coords = cell.gen_uniform_grids()
    ao = jnp.asarray(np.asarray(eval_ao_kpts(cell, coords, kpts)))
    dm = rng.standard_normal((nk, nao, nao)) * 0.3 + np.eye(nao)[None]
    dm = jnp.asarray((dm + dm.transpose(0, 2, 1)).astype(np.complex128))
    vk_full = get_k_kpts(cell, dm, ao, kpts, coords=coords,
                         row_block=nao)
    vk_blk = get_k_kpts(cell, dm, ao, kpts, coords=coords, row_block=2)
    vk_one = get_k_kpts(cell, dm, ao, kpts, coords=coords, row_block=1)
    np.testing.assert_allclose(np.asarray(vk_blk), np.asarray(vk_full),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vk_one), np.asarray(vk_full),
                               rtol=0, atol=1e-12)
