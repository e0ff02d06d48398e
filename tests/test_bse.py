"""BSE-TDA gates (scf.bse) — no external GW/BSE code as oracle:

- bare-W reduction: with W = w_q (no screening) and singlet couplings the
  BSE operator IS the CIS operator (hyb=1) — dense matrices must agree
  to machine precision;
- chi0 -> 0 limit: static_w with huge (scissor-inflated) gaps returns the
  bare metric;
- 2-electron dense oracle: for H2 (nmo=2, one ov pair) the statically
  screened W and the 1x1 BSE matrix have closed forms in the MO pair
  space from the exact plane-wave ERI — the ISDF operator must reproduce
  them;
- scissor consistency: shifting the QP diagonal by a constant (fixed W)
  shifts every eigenvalue by exactly that constant;
- hermiticity of the assembled operator.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.pw import get_eri_from_ao
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import bse as bse_mod
from fftisdf_tpu.scf.tddft import TDAOperator


def h2_cell():
    return Cell(
        a=np.diag([6.0, 6.0, 7.0]),
        atom=[("H", (3.0, 3.0, 1.8)), ("H", (3.0, 3.0, 3.2))],
        basis={"H": [Shell(l=0, exps=np.array([1.2, 0.4]),
                           coeffs=np.eye(2))]},
        pseudo="gth-pade",
        mesh=np.array([14, 14, 15]),
        unit="bohr",
        precision=1e-12,
    ).build()


@pytest.fixture(scope="module")
def gamma_setup():
    cell = h2_cell()
    kpts = np.zeros((1, 3))
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    return cell, kpts, mf, df


def test_bse_with_bare_w_is_cis(gamma_setup):
    cell, kpts, mf, df = gamma_setup
    a_cis = TDAOperator(mf, df, q=0, singlet=True).dense()
    op = bse_mod.BSEOperator(mf, df, q=0, singlet=True,
                             wqs=df.wq)          # screening switched off
    a_bse = op.dense()
    np.testing.assert_allclose(a_bse, a_cis, atol=1e-10)


def test_static_w_chi0_zero_limit(gamma_setup):
    """Scissored gaps: chi0 ~ 1/delta, so W - w_q must vanish LINEARLY in
    the inverse gap (the residual at any finite scissor is physical
    screening, not error)."""
    cell, kpts, mf, df = gamma_setup
    wq = np.asarray(df.wq)
    scale = np.abs(wq).max()
    ds = []
    for shift in (1e6, 1e7):
        qp = np.asarray(mf.mo_energy).copy()
        qp[:, mf.nocc:] += shift
        wqs = np.asarray(bse_mod.static_w(df, mf, qp_energy=qp))
        ds.append(np.abs(wqs - wq).max())
    assert ds[0] < 1e-6 * scale
    assert ds[1] < 0.2 * ds[0]          # ~0.1 expected (chi0 ~ 1/delta)


def test_bse_dense_mo_space_oracle(gamma_setup):
    """Independent dense construction in the MO pair space from the exact
    plane-wave ERI (H2: nocc=1, nvir=3 -> 3 ov pairs):
        chi = chi0 (I - V chi0)^{-1},  chi0 = diag(-4/delta_p)  (nk=1),
        W_{(ab),(ji)} = (ab|ji) + sum_pp' (ab|p) chi_pp' (p'|ji),
        A_{ia,jb} = delta + 2 (ai|jb) - W_{(ab),(ji)}.
    The ISDF-assembled operator's spectrum must match to the compression
    floor."""
    cell, kpts, mf, df = gamma_setup
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))[0]
    mo = ao @ np.asarray(mf.mo_coeff)[0]
    eri = np.asarray(get_eri_from_ao(
        cell, (jnp.asarray(mo),) * 4, np.zeros(3), coords)).real
    e = np.asarray(mf.mo_energy)[0]
    no, nv = mf.nocc, len(e) - mf.nocc
    pairs = [(i, no + a) for i in range(no) for a in range(nv)]
    npair = len(pairs)
    delta_p = np.array([e[a] - e[i] for i, a in pairs])
    chi0 = np.diag(-4.0 / delta_p)
    vmat = np.array([[eri[i1, a1, i2, a2] for (i2, a2) in pairs]
                     for (i1, a1) in pairs])
    chi = chi0 @ np.linalg.inv(np.eye(npair) - vmat @ chi0)
    a_ref = np.zeros((npair, npair))
    for r, (i, a) in enumerate(pairs):
        for c, (j, b) in enumerate(pairs):
            w_abji = eri[a, b, j, i] + sum(
                eri[a, b, i1, a1] * chi[p1, p2] * eri[i2, a2, j, i]
                for p1, (i1, a1) in enumerate(pairs)
                for p2, (i2, a2) in enumerate(pairs))
            a_ref[r, c] = 2.0 * eri[a, i, j, b] - w_abji
            if r == c:
                a_ref[r, c] += delta_p[r]
    w_ref = np.sort(np.linalg.eigvalsh(0.5 * (a_ref + a_ref.T)))
    w, info = bse_mod.bse(mf, df, q=0, nroots=0, dense=True)
    assert info["nonhermiticity"] < 1e-10
    np.testing.assert_allclose(w, w_ref, atol=1e-7)


def test_bse_scissor_shifts_spectrum(gamma_setup):
    cell, kpts, mf, df = gamma_setup
    op0 = bse_mod.BSEOperator(mf, df, q=0)
    qp = np.asarray(mf.mo_energy).copy()
    qp[:, mf.nocc:] += 0.1
    op1 = bse_mod.BSEOperator(mf, df, q=0, qp_energy=qp, wqs=op0.wqs)
    w0 = np.linalg.eigvalsh(0.5 * (op0.dense() + op0.dense().conj().T))
    w1 = np.linalg.eigvalsh(0.5 * (op1.dense() + op1.dense().conj().T))
    np.testing.assert_allclose(w1, w0 + 0.1, atol=1e-10)
