"""Gates for the radial atomic solver (basis/atom.py) and the GTH
pseudopotential provenance discriminator built on it.

Three tiers:
1. exact hydrogenic eigenvalues pin the sqrt-mesh discretization;
2. the all-electron LDA atom matches the NIST LSD reference (restricted,
   Teter-Pade vs NIST's VWN accounts for a few 1e-4 Ha offset);
3. compare_pseudo calibration: a genuine GTH table reproduces the AE
   valence spectrum to ~1e-3 Ha while a single corrupted digit moves it
   by >1e-2 — the evidence standard used for the embedded Ni q18 entry
   (basis/data.py provenance notes).

The GTH fit construction being tested is Goedecker-Teter-Hutter PRB 54,
1703 (1996) section II; the reference consumes these tables through PySCF
(/root/reference/fftisdf.py:424) and never needed a provenance tool.

Grids are reduced from the module defaults to fit the 1-core CI host; the
tolerances below were calibrated against the default-grid values quoted in
the docstrings/PARITY.md.
"""
import numpy as np
import pytest

from fftisdf_tpu.basis.atom import (RadialGrid, ae_occupations,
                                    compare_pseudo, fit_radial_gaussians,
                                    pseudo_occupations, solve_atom,
                                    teter_pade_exc)
from fftisdf_tpu.basis.data import (GTHPseudo, _PSEUDO_PADE,
                                    hgh_offdiag_deviation, load_pseudo, _h)

GRID = RadialGrid(rmax=30.0, n=700)


def test_teter_pade_exchange_anchor():
    # rs->0 limit of the Pade fit is pure exchange: a0 = (3/4)(3/2pi)^(2/3)
    from fftisdf_tpu.basis.atom import _TP_A
    a0_exact = 0.75 * (1.5 / np.pi) ** (2.0 / 3.0)
    assert abs(_TP_A[0] - a0_exact) < 1e-12
    # high-density check: exc -> -a0/rs (exchange-dominated)
    n = 1e6
    rs = (3.0 / (4.0 * np.pi * n)) ** (1.0 / 3.0)
    exc, vxc = teter_pade_exc(np.array([n]))
    assert abs(exc[0] * rs / a0_exact + 1.0) < 0.05
    # vxc consistency by finite differences of n*exc
    h = n * 1e-5
    ep, _ = teter_pade_exc(np.array([n + h]))
    em, _ = teter_pade_exc(np.array([n - h]))
    d_nexc = ((n + h) * ep[0] - (n - h) * em[0]) / (2 * h)
    assert abs(vxc[0] - d_nexc) < 1e-6 * abs(vxc[0])


def test_hydrogenic_exact():
    # bare -Z/r, no Hartree, no xc: eps_nl = -Z^2/(2 n^2)
    r = solve_atom("H", xc=None, coulomb=False, grid=GRID,
                   occ={0: [1.0, 1.0], 1: [1.0]})
    assert abs(r.eps[0][0] + 0.5) < 2e-5
    assert abs(r.eps[0][1] + 0.125) < 2e-5
    assert abs(r.eps[1][0] + 0.125) < 2e-5
    # radial normalization: int u^2 dr = 1
    u = r.u[0][0]
    assert abs(r.grid.integrate(u * u) - 1.0) < 1e-10


def test_occupation_logic():
    assert ae_occupations("Ni") == {0: [2.0, 2.0, 2.0, 2.0],
                                    1: [6.0, 6.0], 2: [8.0]}
    ni = load_pseudo("gth-pade", "Ni")       # q18: strip 1s 2s 2p
    assert pseudo_occupations("Ni", ni) == {0: [2.0, 2.0],
                                            1: [6.0], 2: [8.0]}
    c = load_pseudo("gth-pade", "C")         # q4: strip 1s
    assert pseudo_occupations("C", c) == {0: [2.0], 1: [2.0]}
    # stripping that would split an open shell must refuse
    fake = GTHPseudo(3, 0.3, np.array([-4.0]))   # C with zion=3
    with pytest.raises(ValueError):
        pseudo_occupations("C", fake)


def test_carbon_ae_vs_nist_lda():
    # NIST LSD (spin-restricted) carbon: 2s -0.500866, 2p -0.199186
    # (physics.nist.gov/PhysRefData/DFTdata; VWN correlation).  Teter-Pade
    # vs VWN plus the reduced grid gives the tolerance.
    r = solve_atom("C", grid=RadialGrid(rmax=30.0, n=900))
    assert r.converged
    assert abs(r.eps[0][1] - (-0.500866)) < 2e-3
    assert abs(r.eps[1][0] - (-0.199186)) < 2e-3
    # total energy carries the 1s-cusp discretization error at this
    # reduced grid (0.044 at n=900 -> <1e-3 at the n=2400 default);
    # the eigenvalues above are the physical gate
    assert abs(r.e_tot - (-37.470031)) < 0.06


def test_pseudo_provenance_discriminator():
    # genuine H gth-pade reproduces the AE valence eigenvalue to <5e-4
    out = compare_pseudo("H", grid=GRID)
    assert out["converged"]
    assert out["maxerr"] < 5e-4
    # a first-digit cloc transcription error is loud (measured 8.8e-3)
    good = load_pseudo("gth-pade", "H")
    bad = GTHPseudo(good.zion, good.rloc,
                    good.cloc + np.array([1.0, 0.0]), good.projectors)
    out_bad = compare_pseudo("H", pseudo=bad, grid=GRID)
    assert out_bad["maxerr"] > 5e-3
    assert out_bad["maxerr"] > 10 * out["maxerr"]


def test_hgh_offdiag_relations():
    # every embedded GTH-PADE entry satisfies the HGH-1998 h12/h22
    # relation: exactly for light elements / GTH-96 descendants, to the
    # published print precision (~1e-3) for the Ni q18 semicore entry.
    # This check caught the original Si h22 transcription error (dev
    # 4.3e-2, eigenvalue error 21 mHa vs the genuine table's <2 mHa).
    for sym, ps in _PSEUDO_PADE.items():
        assert hgh_offdiag_deviation(ps) < 1e-3, sym
    bad = GTHPseudo(4, 0.44, np.array([-7.33610297]),
                    [(0, 0.42273813, _h([5.90692831, -1.26189397],
                                        [2.93454196]))])  # the old Si h22
    assert hgh_offdiag_deviation(bad) > 1e-2


def test_fit_radial_gaussians_roundtrip():
    # a state that IS a normalized primitive comes back exactly
    from fftisdf_tpu.basis.gto import gto_norm
    g = RadialGrid(rmax=30.0, n=900)
    exps = np.array([2.5, 0.8, 0.2])
    target = 1  # the 0.8 primitive, l=1
    u = gto_norm(1, exps[target]) * g.r ** 2 * np.exp(-exps[target] * g.r ** 2)
    c, resid = fit_radial_gaussians(u, 1, exps, g)
    want = np.zeros(3)
    want[target] = 1.0
    assert np.allclose(c, want, atol=1e-8)
    assert resid < 1e-7
    # hydrogen 1s in a 3-Gaussian set: the classic STO-3G-quality fit,
    # a few-percent residual, all-positive coefficients
    r = solve_atom("H", xc=None, coulomb=False, grid=g)
    c, resid = fit_radial_gaussians(r.u[0][0], 0, np.array(
        [3.42525091, 0.62391373, 0.16885540]), g)
    assert (c > 0).all() and resid < 0.06


def test_fit_gth_recovers_genuine_carbon():
    # the GTH-96 refit procedure (basis/fit.py), gated by recovery: start
    # from a corrupted C table (first-digit cloc + h11 errors, maxerr
    # 2.4e-2) and refit against the in-repo AE atom — the fit must land
    # back in the genuine-table band (<5e-4; measured 1.4e-5) with the
    # parameters at the published values.  This is the evidence standard
    # behind the in-repo-refit Ni q18 entry in basis/data.py.
    from fftisdf_tpu.basis.fit import fit_gth
    good = load_pseudo("gth-pade", "C")
    bad = GTHPseudo(good.zion, good.rloc, good.cloc + np.array([0.8, -0.3]),
                    [(0, good.projectors[0][1], _h([9.52284179 + 1.5]))])
    fitted, info = fit_gth("C", bad, grid=GRID)
    assert info["converged"]
    assert info["maxerr"] < 5e-4
    assert info["max_qerr"] < 1e-4
    assert np.allclose(fitted.cloc, good.cloc, atol=5e-2)
    assert abs(fitted.projectors[0][2][0, 0]
               - good.projectors[0][2][0, 0]) < 5e-2


def test_ni_refit_entry_passes_discriminator():
    # the embedded Ni q18 entry is an in-repo refit (basis/data.py
    # provenance notes; the transcription it replaced failed this same
    # gate by 4.75 Ha).  It must land in the genuine-table band on the
    # discriminator that certified it, and satisfy the HGH off-diagonal
    # relations exactly (they were enforced by the fit parameterization).
    ni = load_pseudo("gth-pade", "Ni")
    assert hgh_offdiag_deviation(ni) < 1e-9
    out = compare_pseudo("Ni", grid=GRID)
    assert out["converged"]
    assert out["maxerr"] < 1e-3
    assert set(out["pp"]) == {(0, 0), (1, 0), (0, 1), (0, 2)}


def test_pseudo_projector_path_carbon():
    # C gth-pade exercises the separable nonlocal (dense) path: genuine
    # table 3.5e-4, a 5% h11 corruption 1.1e-2 (30x separation) — the
    # calibration behind the Ni q18 provenance verdict in basis/data.py
    out = compare_pseudo("C", grid=GRID)
    assert out["converged"]
    assert out["maxerr"] < 1e-3
    assert set(out["pp"]) == {(0, 0), (0, 1)}
    good = load_pseudo("gth-pade", "C")
    bad = GTHPseudo(good.zion, good.rloc, good.cloc,
                    [(0, good.projectors[0][1], _h([9.52284179 + 0.5]))])
    out_bad = compare_pseudo("C", pseudo=bad, grid=GRID)
    assert out_bad["maxerr"] > 5e-3
    assert out_bad["maxerr"] > 10 * out["maxerr"]
