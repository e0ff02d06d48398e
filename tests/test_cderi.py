"""ISDF-compact cderi (GDF-analog) gates: the 3-index pairing reproduces
the 4-index ERIs and the J/K the metric form serves (the third column of
the reference benchmark harness, ``/root/reference/fftisdf.py:446-457``)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.isdf import cderi as cd_mod
from tests.test_isdf_kpoint import he2, trs_dm  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def he2_df(he2):  # noqa: F811
    cell, kpts, coords, ao = he2
    kpts4 = cell.get_kpts([1, 2, 2])
    df = FFTISDF(cell, kpts4, c0=12.0, m0=(7, 7, 9), verbose=0).build()
    return cell, kpts4, df


def test_cderi_eri_pairing(he2_df):
    """sum_P A12 conj(A43) == the metric-form ERI, up to the PSD clip of
    the hermitized metric (bounded by the fit floor)."""
    cell, kpts, df = he2_df
    cd = cd_mod.wq_to_cd(df.wq)
    k3c = df.kconserv3()
    for kidx in [(0, 0, 0, 0), (0, 1, 2, int(k3c[0, 1, 2])),
                 (1, 3, 0, int(k3c[1, 3, 0]))]:
        k1, k2, k3, k4 = kidx
        q = int(df.kconserv2()[k1, k2])
        eri_ref = np.asarray(df.get_eri(kidx))
        eri_cd = np.asarray(cd_mod.assemble_eri_cderi(
            cd[q], df.x_k[k1], df.x_k[k2], df.x_k[k3], df.x_k[k4]))
        scale = max(1.0, np.abs(eri_ref).max())
        # hermitization + PSD clip move near-null metric directions only
        np.testing.assert_allclose(eri_cd, eri_ref, atol=1e-6 * scale)


def test_cderi_jk_matches_metric_serve(he2_df):
    cell, kpts, df = he2_df
    cd = cd_mod.wq_to_cd(df.wq)
    q_of = cd_mod.q_index_table(cell, kpts)
    dm = trs_dm(cell, kpts, df.x_k.shape[2])[0]
    vj0, vk0 = df.get_jk(dm)
    vj1, vk1 = cd_mod.get_jk_cderi(df.x_k, cd, jnp.asarray(q_of),
                                   jnp.asarray(dm), k2_chunk=2)
    np.testing.assert_allclose(np.asarray(vj1), np.asarray(vj0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vk1), np.asarray(vk0), atol=1e-6)


def test_cderi_naux_is_compact(he2_df):
    """The point of the arm: naux == nip << ngrid (the exact plane-wave
    factor's auxiliary dimension)."""
    cell, kpts, df = he2_df
    cd = cd_mod.wq_to_cd(df.wq)
    assert cd.shape == (len(kpts), df.nip, df.nip)
    assert df.nip < int(np.prod(cell.mesh))


def test_cderi_signed_exactness(he2_df):
    """Signed factors reproduce the metric serve EXACTLY (eigh roundoff),
    even where the PSD clip loses the indefinite fit-noise tail — the
    round-4 finding that made the plain cderi arm 10x less accurate than
    the ISDF serve at identical naux."""
    cell, kpts, df = he2_df
    cd, sgn = cd_mod.wq_to_cd_signed(df.wq)
    # factor identity: cd^H diag(sign) cd == hermitized w_q
    w_h = 0.5 * (np.asarray(df.wq)
                 + np.conj(np.swapaxes(np.asarray(df.wq), -1, -2)))
    w_rec = np.einsum("qPI,qP,qPJ->qIJ", np.conj(np.asarray(cd)),
                      np.asarray(sgn), np.asarray(cd))
    np.testing.assert_allclose(w_rec, w_h,
                               atol=1e-10 * np.abs(w_h).max())
    # served J/K: match the metric serve to hermitization error only
    q_of = cd_mod.q_index_table(cell, kpts)
    dm = trs_dm(cell, kpts, df.x_k.shape[2])[0]
    vj0, vk0 = df.get_jk(dm)
    vj1, vk1 = cd_mod.get_jk_cderi(df.x_k, cd, jnp.asarray(q_of),
                                   jnp.asarray(dm), k2_chunk=2, sign=sgn)
    np.testing.assert_allclose(np.asarray(vj1), np.asarray(vj0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(vk1), np.asarray(vk0), atol=1e-8)
    # ERI pairing with signs
    k3c = df.kconserv3()
    kidx = (0, 1, 2, int(k3c[0, 1, 2]))
    q = int(df.kconserv2()[0, 1])
    eri_ref = np.asarray(df.get_eri(kidx))
    eri_cd = np.asarray(cd_mod.assemble_eri_cderi(
        cd[q], df.x_k[0], df.x_k[1], df.x_k[2], df.x_k[kidx[3]],
        sign_q=sgn[q]))
    scale = max(1.0, np.abs(eri_ref).max())
    np.testing.assert_allclose(eri_cd, eri_ref, atol=1e-8 * scale)
