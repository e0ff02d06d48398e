"""G0W0 gates.

- Pade/Thiele continuation recovers a rational model exactly;
- gamma point: the nip-space Sigma^c(iw) equals the explicit ov-pair-space
  oracle built from exact plane-wave MO ERIs (pins the chi/Wc/contraction
  chain), and the quadrature matches the *analytic* dRPA pole-sum oracle;
- QP energies from the Pade continuation match the exact real-axis
  pole-sum oracle (tight at the gap edges where AC is reliable);
- a KRKS(xc='hf') reference reproduces G0W0@KRHF (static correction == 0);
- k-mesh consistency: 1x1x2 QP spectrum == gamma of the doubled supercell
  — pins the 1/nk normalization and every phase/conjugation convention.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf.gw import (g0w0, sigma_c_iw, sigma_c_ov_space,
                                drpa_poles, sigma_c_from_poles,
                                pade_thiele, pade_eval)
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.pw import get_eri_from_ao

NW = 24


def h2_cell(nz=1, lz=7.0):
    atoms = []
    for i in range(nz):
        atoms += [("H", (3.0, 3.0, 1.8 + lz * i)),
                  ("H", (3.0, 3.0, 3.2 + lz * i))]
    return Cell(
        a=np.diag([6.0, 6.0, lz * nz]),
        atom=atoms,
        basis={"H": [Shell(l=0, exps=np.array([1.2, 0.4]),
                           coeffs=np.eye(2))]},
        pseudo="gth-pade",
        mesh=np.array([14, 14, int(14 * nz * lz / 6) // 2 * 2 + 1]),
        unit="bohr",
        precision=1e-12,
    ).build()


def _gamma_reference():
    cell = h2_cell()
    kpts = np.zeros((1, 3))
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))[0]
    c = np.asarray(mf.mo_coeff)[0]
    eri_mo = np.asarray(get_eri_from_ao(
        cell, (jnp.asarray(ao @ c),) * 4, np.zeros(3), coords))
    return cell, mf, df, eri_mo


def test_pade_recovers_rational():
    poles = np.array([-1.3, -0.2, 0.4, 2.1])
    res = np.array([0.3, 0.8, 0.5, 1.1])

    def f(z):
        return np.sum(res / (z[..., None] - poles), axis=-1)

    w = np.linspace(0.05, 4.0, 12)
    model = pade_thiele(1j * w, f(1j * w))
    zq = np.array([0.1 + 0.02j, -0.5 + 0.05j, 1.0 + 0.1j])
    np.testing.assert_allclose(pade_eval(model, zq), f(zq), atol=1e-9)


def test_sigma_iw_matches_dense_and_pole_oracles():
    cell, mf, df, eri_mo = _gamma_reference()
    mo_e = np.asarray(mf.mo_energy)[0]
    nocc = 1

    sigma, iw, ef, orbs = sigma_c_iw(df, mf, nw=NW)
    sig_ref, _, ef_ref = sigma_c_ov_space(eri_mo, mo_e, nocc, nw=NW)
    assert abs(ef - ef_ref) < 1e-12
    # full-rank ISDF: the nip-space contraction is numerically exact
    np.testing.assert_allclose(sigma[0], sig_ref, atol=1e-8)

    # analytic frequency integral (pole sum) vs the shared quadrature
    om_s, resid, _ = drpa_poles(eri_mo, mo_e, nocc)
    sig_pole = sigma_c_from_poles(om_s, resid, ef, mo_e, nocc, 1j * iw)
    np.testing.assert_allclose(sig_ref.T, sig_pole, atol=5e-3)

    # QP equation: Pade-continued vs exact pole-sum self-energy
    e_qp, info = g0w0(df, mf, nw=NW)

    def qp_pole(n):
        e = mo_e[n]
        for _ in range(200):
            s = sigma_c_from_poles(om_s, resid, ef, mo_e, nocc,
                                   np.array([e - ef + 0j]))[0, n].real
            e_new = mo_e[n] + s
            if abs(e_new - e) < 1e-12:
                break
            e = 0.5 * (e + e_new)
        return e

    qp_ref = np.array([qp_pole(n) for n in range(len(mo_e))])
    # frontier orbitals: AC is essentially exact near the gap
    np.testing.assert_allclose(e_qp[0, :2], qp_ref[:2], atol=1e-5)
    # high-lying virtuals: continuation degrades far from eF (the top
    # virtual of the minimal basis misses by ~3e-2 at nw=24)
    np.testing.assert_allclose(e_qp[0], qp_ref, atol=5e-2)
    # GW physics sanity: finite renormalization, correlation binds the HOMO
    assert np.all(info["z"][0] > 0.5) and np.all(info["z"][0] <= 1.5)
    assert e_qp[0, 0] < mo_e[0]


def test_g0w0_ks_hf_reference_matches_krhf():
    from fftisdf_tpu.scf.ks import KRKS

    cell = h2_cell()
    kpts = np.zeros((1, 3))
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-11)
    mf.kernel()
    ks = KRKS(cell, kpts, xc="hf", verbose=0, conv_tol=1e-11)
    ks.kernel()
    assert ks.converged
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    e_hf, _ = g0w0(df, mf, nw=NW)
    e_ks, info = g0w0(df, ks, nw=NW)
    # xc='hf': hyb=1 and vxc=0, so the static correction vanishes and the
    # KS path must reproduce the HF path exactly (same converged orbitals)
    assert np.abs(info["correction"]).max() < 1e-10
    np.testing.assert_allclose(e_ks, e_hf, atol=1e-5)


@pytest.mark.slow
def test_g0w0_supercell_consistency():
    cell1 = h2_cell(nz=1)
    kpts2 = cell1.get_kpts([1, 1, 2])
    mf1 = KRHF(cell1, kpts2, verbose=0, conv_tol=1e-10)
    mf1.kernel()
    df1 = FFTISDF(cell1, kpts2, c0=60.0, m0=(11, 11, 13), verbose=0,
                  select_tol=1e-18, rcond=1e-12).build()
    e1, _ = g0w0(df1, mf1, nw=NW)

    cell2 = h2_cell(nz=2)
    mf2 = KRHF(cell2, np.zeros((1, 3)), verbose=0, conv_tol=1e-10)
    mf2.kernel()
    df2 = FFTISDF(cell2, np.zeros((1, 3)), c0=60.0, m0=(11, 11, 25),
                  verbose=0, select_tol=1e-18, rcond=1e-12).build()
    e2, _ = g0w0(df2, mf2, nw=NW)

    k_all = np.sort(e1.ravel())
    s_all = np.sort(e2.ravel())
    # frontier (gap edge) orbitals: tight; full spectrum: AC noise on the
    # high virtuals dominates (measured 6e-5 max at nw=32)
    np.testing.assert_allclose(k_all[:4], s_all[:4], atol=1e-4)
    np.testing.assert_allclose(k_all, s_all, atol=5e-4)
