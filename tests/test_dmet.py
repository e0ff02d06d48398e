"""DMET + FCI gates (scf.dmet, scf.fci).

- FCI: determinant-basis solver vs an independent dense Jordan-Wigner
  construction (different operator machinery) at random complex
  integrals; RDM conventions are pinned by the solver's internal
  E(gamma, Gamma) == eigenvalue assert.
- DMET full-fragment gamma-point limit: embedding == whole molecule, so
  E_DMET must equal E_HF + E_corr(FCI) — cross-checked against CCSD,
  which is exact for the 2-electron fixture and shares NO code with the
  FCI/DMET path.
- DMET fragment run on the 1x1x2 chain: atom-fragment corrections are
  negative and their sum reproduces the full-lattice CCSD correlation
  to the embedding approximation (~coarse bound).
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf.fci import fci_ground
from fftisdf_tpu.scf.dmet import dmet_energy, build_embedding
from fftisdf_tpu.isdf import FFTISDF


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


def _df_mf(cell, kpts):
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    return df, mf


def test_fci_vs_dense_jw():
    """Determinant-basis FCI vs the dense JW oracle construction."""
    from test_cc import _jw_annihilators

    rng = np.random.default_rng(3)
    n = 3
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h = h + h.conj().T
    a = rng.standard_normal((n,) * 4) + 1j * rng.standard_normal((n,) * 4)
    a = a + a.transpose(2, 3, 0, 1)
    eri = a + a.transpose(1, 0, 3, 2).conj()
    e, g, gam2 = fci_ground(h, eri, (2, 1))
    assert abs(np.trace(g) - 3) < 1e-10
    np.testing.assert_allclose(g, g.conj().T, atol=1e-10)

    nm = 2 * n
    c = _jw_annihilators(nm)
    cd = [m.T for m in c]
    dim = 2 ** nm
    H = np.zeros((dim, dim), dtype=complex)
    for p in range(n):
        for q in range(n):
            H += h[p, q] * (cd[p] @ c[q] + cd[n + p] @ c[n + q])
            for r in range(n):
                for s in range(n):
                    for s1 in (0, n):
                        for s2 in (0, n):
                            H += 0.5 * eri[p, q, r, s] * (
                                cd[p + s1] @ cd[r + s2]
                                @ c[s + s2] @ c[q + s1])
    occ = np.array([[(st >> (nm - 1 - b)) & 1 for b in range(nm)]
                    for st in range(dim)])
    sec = np.where((occ[:, :n].sum(1) == 2)
                   & (occ[:, n:].sum(1) == 1))[0]
    w = np.linalg.eigvalsh(H[np.ix_(sec, sec)])
    np.testing.assert_allclose(e, w[0], atol=1e-9)


def test_dmet_full_fragment_equals_fci_and_ccsd():
    """Gamma point, fragment = every AO: the embedding IS the molecule,
    so DMET returns E_HF + E_corr(FCI); CCSD (exact for 2 electrons,
    independent code path) must agree."""
    from fftisdf_tpu.scf.cc import kccsd

    cell = h2_cell()
    df, mf = _df_mf(cell, np.zeros((1, 3)))
    e_dmet, info = dmet_energy(mf, df, frag_ao=list(range(4)))
    assert info["nbath"] == 0
    e_ccsd, cinfo = kccsd(df, mf, conv_tol=1e-10, max_cycle=80)
    assert cinfo["converged"]
    np.testing.assert_allclose(e_dmet, mf.e_tot + e_ccsd, atol=1e-7)
    assert e_dmet < mf.e_tot


def test_dmet_atom_fragments_h2_chain():
    """1x1x2 chain, one H atom per fragment: bath size = fragment size,
    corrections negative, and the two fragment corrections sum to the
    full-lattice CCSD correlation within the embedding error."""
    from fftisdf_tpu.scf.cc import kccsd

    cell = h2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    df, mf = _df_mf(cell, kpts)

    e1, info1 = dmet_energy(mf, df, frag_ao=[0, 1])
    e2, info2 = dmet_energy(mf, df, frag_ao=[2, 3])
    assert info1["nbath"] == 2 and info2["nbath"] == 2
    assert info1["de_corr"] < 0 and info2["de_corr"] < 0
    assert abs(info1["de_imag"]) < 1e-8

    e_ccsd, cinfo = kccsd(df, mf, conv_tol=1e-9, max_cycle=80)
    assert cinfo["converged"]
    total = info1["de_corr"] + info2["de_corr"]
    # embedding approximation: same ballpark as the exact correlation
    assert 0.5 * abs(e_ccsd) < abs(total) < 1.5 * abs(e_ccsd)


def test_dmet_mu_fit_conserves_fragment_filling():
    """Chemical-potential fitting drives the correlated fragment filling
    to the mean-field value; the energy stays within the embedding
    error of the unfitted one for this weakly correlated chain."""
    cell = h2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    df, mf = _df_mf(cell, kpts)
    e0, info0 = dmet_energy(mf, df, frag_ao=[0, 1])
    e1, info1 = dmet_energy(mf, df, frag_ao=[0, 1], fit_mu=True)
    assert info1.get("nfrag_err", 0.0) < 1e-6
    assert abs(e1 - e0) < 5e-3
    assert info1["de_corr"] < 0


def test_ccsd_solver_vs_fci():
    """The molecular CCSD impurity solver (scf.cc.ccsd_solver) vs exact
    diagonalization: identical for 2 electrons (energy AND both RDMs —
    CCSD is exact there), close for 4."""
    from fftisdf_tpu.scf.cc import ccsd_solver

    rng = np.random.default_rng(43)
    n = 4
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h = h + h.conj().T
    np.fill_diagonal(h, np.sort(rng.standard_normal(n)) * 2 - 1)
    a = 0.15 * (rng.standard_normal((n,) * 4)
                + 1j * rng.standard_normal((n,) * 4))
    a = a + a.transpose(2, 3, 0, 1)
    eri = a + a.transpose(1, 0, 3, 2).conj()

    e2, g2, G2 = ccsd_solver(h, eri, 2)
    ef, gf, Gf = fci_ground(h, eri, 2)
    np.testing.assert_allclose(e2, ef, atol=1e-8)
    np.testing.assert_allclose(g2, gf, atol=1e-6)
    np.testing.assert_allclose(G2, Gf, atol=1e-6)

    e4, g4, _ = ccsd_solver(h, eri, 4)
    ef4, _, _ = fci_ground(h, eri, 4)
    # CCSD is inexact at 4 electrons, but must recover most of the
    # correlation (HF energy via a quick damped density iteration)
    from fftisdf_tpu.scf.cc import _vhf_chem
    gam_hf = np.zeros((n, n), dtype=complex)
    # HF via the same machinery: converge a quick density
    gam_hf[:2, :2] = 2 * np.eye(2)
    for _ in range(200):
        f = h + _vhf_chem(eri, gam_hf)
        w, c = np.linalg.eigh(0.5 * (f + f.conj().T))
        gnew = 2.0 * (c[:, :2] @ c[:, :2].conj().T).T
        if np.max(np.abs(gnew - gam_hf)) < 1e-11:
            gam_hf = gnew
            break
        gam_hf = 0.5 * (gam_hf + gnew)
    ehf4 = float(np.real(np.einsum("pq,pq->", h, gam_hf)
                         + 0.5 * np.einsum("pq,pq->",
                                           _vhf_chem(eri, gam_hf),
                                           gam_hf)))
    assert abs(e4 - ef4) < 0.2 * abs(ehf4 - ef4)
    assert abs(e4 - ef4) < 1e-2


def test_dmet_with_ccsd_solver():
    """DMET with the CCSD impurity solver tracks the FCI-solver result
    on the weakly correlated chain fragment."""
    from fftisdf_tpu.scf.cc import ccsd_solver

    cell = h2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    df, mf = _df_mf(cell, kpts)
    e_fci_solver, i1 = dmet_energy(mf, df, frag_ao=[0, 1])
    e_cc_solver, i2 = dmet_energy(mf, df, frag_ao=[0, 1],
                                  solver=ccsd_solver)
    assert i2["de_corr"] < 0
    np.testing.assert_allclose(e_cc_solver, e_fci_solver, atol=2e-4)


def test_dmet_bath_exactness_checks():
    """build_embedding invariants: orthonormal embedding basis and an
    idempotent embedded mean-field RDM (asserted inside), correct
    electron count in the embedding."""
    cell = h2_cell()
    kpts = cell.get_kpts([1, 1, 2])
    df, mf = _df_mf(cell, kpts)
    c_ao_lo, gamma_mf, nfrag, info = build_embedding(mf, [0, 1])
    assert c_ao_lo.shape == (2, 4, 2 + info["nbath"])
    ne = float(np.trace(gamma_mf).real)
    assert abs(ne - round(ne)) < 1e-6
