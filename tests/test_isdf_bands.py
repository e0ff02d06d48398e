"""ISDF-served band J/K vs the exact plane-wave band path (round-2 #7).

The reference cannot serve kpts_band at all (``fftisdf.py:194``).  Here the
ISDF product state serves band points through per-pair re-fits
(isdf.bands.get_jk_bands); the gate is agreement with the exact plane-wave
(band, mesh) pair sweep: to roundoff in the full-rank regime, to
compression error at production c0.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.lattice import structure
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.basis.eval import eval_ao_kpts, make_evaluator
from fftisdf_tpu.pw import jk as pw_jk
from fftisdf_tpu.scf import KRHF
from tests.test_isdf_kpoint import trs_dm


@pytest.fixture(scope="module")
def he2_setup():
    cell = Cell(
        a=np.diag([5.0, 5.0, 7.0]),
        atom=[("He", (2.5, 2.5, 2.0)), ("He", (2.5, 2.5, 4.5))],
        basis={"He": [Shell(l=0, exps=np.array([1.0, 0.35]),
                            coeffs=np.eye(2))]},
        pseudo=None,
        mesh=np.array([12, 12, 16]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts([1, 1, 2])
    # off-mesh band points + one mesh point
    b = cell.reciprocal_vectors()
    kpts_band = np.array([0.17 * b[2], 0.33 * b[0] + 0.41 * b[2],
                          kpts[1]])
    return cell, kpts, kpts_band


def _pw_band_jk(cell, kpts, kpts_band, dm):
    from fftisdf_tpu.isdf.bands import _qlat_dmin2
    from fftisdf_tpu.lattice import kpoints as kpt_mod

    coords = cell.gen_uniform_grids()
    ao = jnp.asarray(np.asarray(eval_ao_kpts(cell, coords, kpts)))
    aob = jnp.asarray(np.asarray(eval_ao_kpts(cell, coords, kpts_band)))
    kmesh = kpt_mod.kpts_to_kmesh(cell, kpts)
    thr = _qlat_dmin2(cell, kmesh)
    vj = pw_jk.get_j_kpts(cell, jnp.asarray(dm), ao, ao_band=aob)
    vk = pw_jk.get_k_kpts(cell, jnp.asarray(dm), ao, kpts, coords=coords,
                          ao_band=aob, kpts_band=kpts_band,
                          g0_argmin_thresh=thr)
    return np.asarray(vj), np.asarray(vk)


def test_isdf_bands_full_rank_match_pw(he2_setup):
    """Full-rank regime: per-pair re-fits are exact, band J/K must match
    the exact plane-wave pair sweep to near-roundoff."""
    cell, kpts, kpts_band = he2_setup
    df = FFTISDF(cell, kpts, c0=60.0, m0=tuple(cell.mesh), verbose=0,
                 select_tol=1e-20, rcond=1e-12).build()
    nao = df.x_k.shape[2]
    dm = trs_dm(cell, kpts, nao)[0]
    vj_ref, vk_ref = _pw_band_jk(cell, kpts, kpts_band, dm)
    vj_b, vk_b = df.get_jk(dm, kpts_band=kpts_band)
    np.testing.assert_allclose(np.asarray(vj_b), vj_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vk_b), vk_ref, atol=1e-8)


def test_isdf_bands_compressed_match_pw(he2_setup):
    """Compressed regime: agreement to compression error."""
    cell, kpts, kpts_band = he2_setup
    df = FFTISDF(cell, kpts, c0=10.0, m0=(7, 7, 11), verbose=0).build()
    nao = df.x_k.shape[2]
    dm = trs_dm(cell, kpts, nao)[0]
    vj_ref, vk_ref = _pw_band_jk(cell, kpts, kpts_band, dm)
    vj_b, vk_b = df.get_jk(dm, kpts_band=kpts_band)
    scale = max(1.0, np.abs(vk_ref).max())
    np.testing.assert_allclose(np.asarray(vj_b), vj_ref,
                               atol=1e-3 * scale)
    np.testing.assert_allclose(np.asarray(vk_b), vk_ref,
                               atol=1e-3 * scale)


@pytest.mark.slow
def test_get_bands_isdf_vs_pw_diamond():
    """End-to-end: KRHF band energies on diamond served from the ISDF
    state (with_df = FFTISDF) track the exact-PW band path to compression
    error — the round-2 'done' criterion."""
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=40.0)
    kpts = cell.get_kpts([1, 1, 2])
    b = cell.reciprocal_vectors()
    kpts_band = np.array([0.2 * b[0], 0.25 * (b[0] + b[1] + b[2])])

    mf_pw = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf_pw.kernel()
    assert mf_pw.converged
    es_pw, _ = mf_pw.get_bands(kpts_band)

    df = FFTISDF(cell, kpts, c0=20.0, verbose=0).build()
    mf_isdf = KRHF(cell, kpts, with_df=df, verbose=0, conv_tol=1e-10)
    mf_isdf.kernel()
    assert mf_isdf.converged
    es_isdf, _ = mf_isdf.get_bands(kpts_band)

    for e_pw, e_isdf in zip(es_pw, es_isdf):
        n = min(len(e_pw), len(e_isdf), 6)   # occupied + low virtuals
        np.testing.assert_allclose(np.asarray(e_isdf)[:n],
                                   np.asarray(e_pw)[:n], atol=2e-3)
