"""Equation-of-state gates (scf.eos).

* the linear BM3 fit recovers synthetic Birch-Murnaghan parameters
  (e0, v0, b0, bp) to machine precision — the closed-form x = V^(-2/3)
  parameter extraction is exact, not an optimizer;
* on a real SCF volume scan, the fitted -dE/dV must reproduce the
  ANALYTIC pressures measured point-by-point through the reference-traced
  strain evaluator (two independent derivative paths: interpolation of
  energies vs reverse-mode of each point's Lagrangian);
* the unscaled point reuses the converged reference (energy bit-equal).
"""
import numpy as np

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import KRHF
from fftisdf_tpu.scf import eos

A0 = 4.0


def he_sc_cell():
    shells = [Shell(l=0, exps=np.array([2.5, 0.7]),
                    coeffs=np.array([[0.6], [0.5]]))]
    return Cell(
        a=np.diag([A0, A0, A0]),
        atom=[("He", np.zeros(3))],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array([10, 10, 10]),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_bm3_fit_exact_recovery():
    rng = np.random.default_rng(7)
    for _ in range(4):
        e0 = rng.uniform(-10.0, 10.0)
        v0 = rng.uniform(50.0, 300.0)
        b0 = rng.uniform(1e-3, 5e-2)
        bp = rng.uniform(2.0, 7.0)
        v = np.linspace(0.85 * v0, 1.15 * v0, 9)
        fit = eos.fit_birch_murnaghan(v, eos.birch_murnaghan(v, e0, v0,
                                                             b0, bp))
        assert fit["rms"] < 1e-12 * max(1.0, abs(e0))
        np.testing.assert_allclose(fit["e0"], e0, rtol=0, atol=1e-9)
        np.testing.assert_allclose(fit["v0"], v0, rtol=1e-9)
        np.testing.assert_allclose(fit["b0"], b0, rtol=1e-7)
        np.testing.assert_allclose(fit["bp"], bp, rtol=1e-6)
        # fitted pressure == analytic BM3 pressure everywhere on the scan
        h = 1e-6 * v0
        p_fd = -(eos.birch_murnaghan(v + h, e0, v0, b0, bp)
                 - eos.birch_murnaghan(v - h, e0, v0, b0, bp)) / (2 * h)
        np.testing.assert_allclose(eos.bm_pressure(fit["poly"], v), p_fd,
                                   rtol=1e-5, atol=1e-12)


def test_eos_scan_pressure_crossgate():
    cell = he_sc_cell()
    mf = KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-11)
    mf.kernel()
    assert mf.converged

    res = eos.kernel(mf, scales=np.linspace(0.97, 1.03, 5))
    assert np.isfinite(res.energies).all()
    np.testing.assert_allclose(res.volumes,
                               res.scales ** 3 * float(cell.vol),
                               rtol=1e-14)
    # the s = 1 point reuses the converged reference SCF
    i1 = int(np.argmin(np.abs(res.scales - 1.0)))
    assert abs(res.energies[i1] - mf.e_tot) < 1e-9

    # fit quality: BM3 represents a smooth E(V) over +/-3% essentially
    # exactly relative to the energy variation across the scan
    de = res.energies.max() - res.energies.min()
    assert res.fit["rms"] < 1e-4 * de

    # cross-gate: fitted -dE/dV vs the analytic per-point pressures
    p_fit = eos.bm_pressure(res.fit["poly"], res.volumes)
    scale = np.abs(res.pressures).max()
    assert scale > 0.0
    np.testing.assert_allclose(p_fit, res.pressures, atol=5e-3 * scale)


def test_qha_grueneisen_oracle():
    """QHA on a synthetic model: BM3 electronic energy + one Einstein mode
    with Grueneisen scaling w(V) = w0 (V/v0)^(-gamma).  The qha-fitted
    V0(T) must track a dense direct minimization of the exact F(V, T), and
    thermal expansion must be positive for gamma > 0."""
    from fftisdf_tpu.scf.phonon import KB_HA

    e0, v0, b0, bp = -2.0, 150.0, 5e-3, 4.3
    w0, gamma = 1.5e-3, 1.8

    def f_vib_exact(v, t):
        w = w0 * (v / v0) ** (-gamma)
        f = w / 2.0
        if t > 0:
            f = f + KB_HA * t * np.log1p(-np.exp(-w / (KB_HA * t)))
        return f

    vols = np.linspace(0.92 * v0, 1.12 * v0, 9)
    e_el = eos.birch_murnaghan(vols, e0, v0, b0, bp)
    ts = np.array([0.0, 150.0, 300.0, 600.0])
    f_vib = np.array([[f_vib_exact(v, t) for v in vols] for t in ts])

    out = eos.qha(vols, e_el, f_vib, ts)

    vfine = np.linspace(vols[0], vols[-1], 20001)
    for i, t in enumerate(ts):
        f_exact = eos.birch_murnaghan(vfine, e0, v0, b0, bp) \
            + f_vib_exact(vfine, t)
        v_oracle = vfine[np.argmin(f_exact)]
        np.testing.assert_allclose(out["v0"][i], v_oracle, rtol=2e-3)
    # ZPE alone already expands the lattice for gamma > 0, and heating
    # expands it further while softening the bulk modulus
    assert out["v0"][0] > v0
    assert np.all(np.diff(out["v0"]) > 0)
    assert out["b0"][-1] < out["b0"][0]
    assert np.all(out["alpha_v"][1:] > 0)


def test_gruneisen_einstein_oracle():
    """Power-law mode scaling w_i(V) = w0_i (V/v0)^(-g_i): mode gammas
    recovered to machine precision (ln w is exactly linear in ln V), a
    zero acoustic column masked out, and the closed-form Grueneisen
    alpha_V = sum gamma_i cv_i / (B0 V0) matching the explicit qha
    F(V, T) minimization on the same model."""
    from fftisdf_tpu.scf.hessian import HARTREE_TO_CM1
    from fftisdf_tpu.scf.phonon import KB_HA

    e0, v0, b0, bp = -2.0, 150.0, 5e-3, 4.3
    w0_cm = np.array([300.0, 700.0, 1100.0])
    g_true = np.array([1.2, 1.8, 0.9])

    vols = np.linspace(0.95 * v0, 1.05 * v0, 7)
    # (nv, nq=1, nmode), with a zero acoustic column that must be masked
    freqs = np.array([
        np.concatenate([[0.0], w0_cm * (v / v0) ** (-g_true)])[None, :]
        for v in vols])

    out = eos.gruneisen(vols, freqs)
    np.testing.assert_allclose(out["gamma"][0, 1:], g_true, atol=1e-12)
    assert out["gamma"][0, 0] == 0.0 and not bool(out["mask"][0, 0])

    # Grueneisen relation vs explicit QHA minimization at T = 300 K
    t = 300.0

    def f_vib(v, ti):
        w = w0_cm * (v / v0) ** (-g_true) / HARTREE_TO_CM1
        f = w.sum() / 2.0
        if ti > 0:
            f = f + KB_HA * ti * np.log1p(-np.exp(-w / (KB_HA * ti))).sum()
        return f

    e_el = eos.birch_murnaghan(vols, e0, v0, b0, bp)
    ts = np.array([t - 5.0, t, t + 5.0])
    fv = np.array([[f_vib(v, ti) for v in vols] for ti in ts])
    ref = eos.qha(vols, e_el, fv, ts)

    out = eos.gruneisen(vols, freqs, temperature=t, b0=ref["b0"][1],
                        v0=ref["v0"][1])
    assert out["alpha_v"] > 0.0
    np.testing.assert_allclose(out["alpha_v"], ref["alpha_v"][1], rtol=0.05)
    assert 0.9 < out["gamma_mean"] < 1.8
