"""LS-THC and AO->MO transform gates.

- the plane-wave cderi factorization reproduces oracle ERIs exactly,
- LS-THC reconstructs cderi at full rank (ref k_least_square.py:205-238
  error report), errors small,
- MO ERIs from ISDF match oracle MO ERIs,
- embedding-space trans_2e is hermitian and real for TRS coefficients, and
  reduces to the plain ERI at nk=1.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.isdf.thc import LSTHC, pw_cderi
from fftisdf_tpu.isdf import ao2mo
from fftisdf_tpu.pw import get_eri_from_ao
from fftisdf_tpu.lattice import kpoints as kpt_mod


@pytest.fixture(scope="module")
def he2():
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
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    return cell, kpts, coords, ao


def test_pw_cderi_reproduces_eri(he2):
    cell, kpts, coords, ao = he2
    k3c = kpt_mod.get_kconserv3(cell, kpts)
    for (k1, k2, k3) in [(0, 0, 0), (0, 1, 0), (1, 0, 1)]:
        k4 = k3c[k1, k2, k3]
        q = kpts[k2] - kpts[k1]
        # both factors use the SAME q-vector (the sector label): using the
        # modular representative of -q instead shifts the FFT bins by a
        # reciprocal vector and breaks the pairing
        c12 = np.asarray(pw_cderi(cell, jnp.asarray(ao[k1]),
                                  jnp.asarray(ao[k2]), q, coords))
        c43 = np.asarray(pw_cderi(cell, jnp.asarray(ao[k4]),
                                  jnp.asarray(ao[k3]), q, coords))
        eri_sol = np.einsum("Qmn,Qlk->mnkl", c12, c43.conj())
        eri_ref = np.asarray(get_eri_from_ao(
            cell, (ao[k1], ao[k2], ao[k3], ao[k4]), q, coords))
        assert abs(eri_sol - eri_ref).max() < 1e-10, (k1, k2, k3, k4)


def test_lsthc_full_rank(he2):
    cell, kpts, coords, ao = he2
    thc = LSTHC(cell, kpts, verbose=0).build()
    report = thc.error_report()
    for (k1, k2, err1, err2) in report:
        assert err1 < 1e-7, (k1, k2, err1)


def test_lsthc_row_only_reference_mode(he2):
    """The reference's k1=0-row fit: exact on the fitted row, degraded on
    pairs outside it (the property its error report exposes)."""
    cell, kpts, coords, ao = he2
    thc = LSTHC(cell, kpts, verbose=0).build(row_only=True)
    report = {(k1, k2): err1 for (k1, k2, err1, _) in thc.error_report()}
    assert report[(0, 0)] < 1e-10 and report[(0, 1)] < 1e-10
    assert report[(1, 1)] < 0.2   # approximate only


def test_mo_eri_matches_oracle(he2):
    cell, kpts, coords, ao = he2
    df = FFTISDF(cell, kpts, c0=50.0, m0=tuple(cell.mesh), verbose=0,
                 select_tol=1e-20, rcond=1e-13).build()
    rng = np.random.default_rng(0)
    nao = ao.shape[2]
    cs = [rng.standard_normal((nao, 2)) + 1j * rng.standard_normal((nao, 2))
          for _ in range(4)]
    kidx = (0, 1, 1, 0)
    eri_mo = np.asarray(ao2mo.mo_eri(df, cs, kidx))
    q = kpts[1] - kpts[0]
    eri_ao = np.asarray(get_eri_from_ao(
        cell, (ao[0], ao[1], ao[1], ao[0]), q, coords))
    ref = np.einsum("mnkl,mi,nj,kx,ly->ijxy", eri_ao,
                    cs[0].conj(), cs[1], cs[2].conj(), cs[3])
    assert abs(eri_mo - ref).max() < 1e-9


def test_trans_2e_gamma_reduces(he2):
    cell, kpts, coords, ao = he2
    kpts1 = np.zeros((1, 3))
    df = FFTISDF(cell, kpts1, c0=50.0, m0=tuple(cell.mesh), verbose=0,
                 select_tol=1e-20, rcond=1e-13).build()
    eri_emb = np.asarray(ao2mo.trans_2e(df))
    eri_ref = np.asarray(df.get_eri((0, 0, 0, 0)))
    np.testing.assert_allclose(eri_emb, eri_ref, atol=1e-10)


def test_trans_2e_hermitian(he2):
    cell, kpts, coords, ao = he2
    df = FFTISDF(cell, kpts, c0=20.0, m0=(7, 7, 9), verbose=0).build()
    eri = np.asarray(ao2mo.trans_2e(df))
    # supercell ERI of real local orbitals: real + 8-fold symmetric
    assert abs(eri.imag).max() < 1e-8
    np.testing.assert_allclose(eri, eri.transpose(1, 0, 3, 2).conj(),
                               atol=1e-8)
    np.testing.assert_allclose(eri, eri.transpose(2, 3, 0, 1), atol=1e-8)
