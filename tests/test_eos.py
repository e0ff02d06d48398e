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


def test_qha_kernel_h2_chain():
    """End-to-end quasi-harmonic pipeline on an H2 molecular chain:
    E(V) scan + frozen Gamma phonons per volume + F(V,T) minimization.
    (GTH-pseudopotential H2 with the bond tuned so the co-scaled-bond
    tension balances the intermolecular chain repulsion: p crosses zero
    INSIDE the scan, so the BM3 minimum is interior and physical.
    All-electron toys fail here — the bare -Z/r potential on the FFT grid
    gives a quadrature-dominated E(V) slope that swamps the physics.)
    Gates: the 3 ASR-pinned acoustic columns masked out of the Grueneisen
    analysis, V0(T) inside the scan, and the closed-form Grueneisen
    thermal expansion consistent (sign and magnitude) with the explicit
    qha FD alpha_V — two independent routes through the same scan."""
    from fftisdf_tpu.lattice import structure

    axy, az, d = 6.0, 4.5, 0.54
    cell = structure.to_cell(
        np.diag([axy, axy, az]),
        [("H", np.array([axy / 2, axy / 2, az / 2 - d])),
         ("H", np.array([axy / 2, axy / 2, az / 2 + d]))],
        basis="gth-szv", pseudo="gth-pade", ke_cutoff=30.0)
    mf = KRHF(cell, cell.get_kpts([1, 1, 1]), verbose=0, conv_tol=1e-11)
    mf.kernel()
    assert mf.converged

    from fftisdf_tpu.scf.hessian import HARTREE_TO_CM1
    from fftisdf_tpu.scf.phonon import KB_HA

    out = eos.qha_kernel(mf, [0.0, 300.0],
                         scales=np.linspace(0.94, 1.06, 5),
                         nrep=(1, 1, 1), step=2e-3)

    assert out["freqs_cm"].shape == (5, 1, 6)
    # ASR pins the 3 Gamma acoustic modes to ~0 -> excluded from gammas
    mask = out["gamma_mask"][0]
    assert mask.sum() == 3 and not mask[:3].any()
    assert np.isfinite(out["v0"]).all()
    assert out["eos"].volumes[0] < out["v0"][0] < out["eos"].volumes[-1]

    # thermal-expansion cross-gate.  Route-agreement to a few percent is
    # validated on the synthetic mixed-gamma oracle below where the QHA
    # ansatz (power-law w(V), BM3 E(V)) holds EXACTLY; on this strongly
    # anharmonic toy (the box scan co-scales the H-H bond, so the stretch
    # mode plunges 2324 -> 1304 cm^-1 across the scan, gamma ~ 1.4) the two
    # routes can only agree in sign and order of magnitude.  Diagnosed
    # pitfalls this gate now controls for:
    #  * f_vib must drop near-zero ASR-residue modes (w < 1 cm^-1): their
    #    kT ln(x) entropy is an O(0.01 Ha) artifact that varies with FD
    #    noise sign per volume and dominates the BM3 fit residual
    #    (phonon.thermodynamics freq_floor_cm fixes the library path);
    #  * the top scan volume has a branch crossing (the plunging stretch
    #    falls below the libration doublet), which scrambles sorted-mode
    #    gammas -> cross-gate on the crossing-free first 4 volumes;
    #  * T must be low enough that V0(T) stays INSIDE the scan window
    #    (at kT ~ hbar w_min the toy expands past the top volume) yet high
    #    enough that the modes are active: T = 700 K.
    # No new SCF needed: f_vib recomputed from the recorded spectra.
    vols, e_el = out["eos"].volumes[:4], out["eos"].energies[:4]
    freqs = out["freqs_cm"][:4]
    w_ha = np.clip(freqs, 0.0, None) / HARTREE_TO_CM1     # (nv, nq, nmode)
    floor = 1.0 / HARTREE_TO_CM1
    t1 = 700.0
    ts = np.array([0.8 * t1, t1, 1.2 * t1])

    def f_vib(iv, t):
        w = w_ha[iv][w_ha[iv] > floor]
        nq = w_ha.shape[1]
        return (w / 2.0 + KB_HA * t
                * np.log1p(-np.exp(-w / (KB_HA * t)))).sum() / nq

    fv = np.array([[f_vib(iv, t) for iv in range(vols.size)] for t in ts])
    ref = eos.qha(vols, e_el, fv, ts)
    assert vols[0] < ref["v0"][1] < vols[-1]              # minimum in-window
    a_fd = ref["alpha_v"][1]                              # central FD at t1
    a_gr = eos.gruneisen(vols, freqs, temperature=float(t1),
                         b0=ref["b0"][1], v0=ref["v0"][1])["alpha_v"]
    assert np.isfinite(a_fd) and np.isfinite(a_gr)
    # clear positive expansion signal (>= 1e-6 1/K, ~10x above the BM3
    # model-error floor measured on this scan), same sign, same decade
    assert a_fd > 1e-6 and a_gr > 1e-6
    assert 0.1 < a_gr / a_fd < 10.0


def test_qha_gruneisen_mixed_gamma_oracle():
    """FD-QHA vs closed-form Grueneisen thermal expansion on a synthetic
    model with MIXED-SIGN mode gammas, where the quasi-harmonic ansatz
    holds exactly: BM3 electronic energy + Einstein modes with power-law
    w_i(V) = w0_i (V/v0)^(-gamma_i).  The two independent routes
    (explicit F(V,T) minimization + central differences of ln V0 vs
    sum_i gamma_i c_i / (B0 V0)) must agree to a few percent even though
    individual mode contributions nearly cancel — the regime where the
    end-to-end H2 gate above can only check sign and decade."""
    from fftisdf_tpu.scf.hessian import HARTREE_TO_CM1
    from fftisdf_tpu.scf.phonon import KB_HA

    e0, v0, b0, bp = -2.0, 150.0, 5e-3, 4.3
    w0s = np.array([8e-4, 1.2e-3, 2.0e-3, 3.1e-3])
    gams = np.array([1.3, -0.5, 0.8, -0.2])

    def fv_exact(v, t):
        w = w0s * (v / v0) ** (-gams)
        f = (w / 2.0).sum()
        if t > 0:
            f += (KB_HA * t * np.log1p(-np.exp(-w / (KB_HA * t)))).sum()
        return f

    vols = np.linspace(0.94 * v0 * 1.05, 1.06 * v0 * 1.05, 7)
    e_el = eos.birch_murnaghan(vols, e0, v0, b0, bp)
    ts = np.array([200.0, 300.0, 400.0])
    f_vib = np.array([[fv_exact(v, t) for v in vols] for t in ts])
    out = eos.qha(vols, e_el, f_vib, ts)
    freqs = np.array([w0s * (v / v0) ** (-gams) for v in vols]) \
        * HARTREE_TO_CM1
    g = eos.gruneisen(vols, freqs, temperature=300.0, b0=out["b0"][1],
                      v0=out["v0"][1])
    # the log-log fit recovers the exact power-law exponents
    np.testing.assert_allclose(g["gamma"], gams, atol=1e-10)
    a_fd, a_gr = out["alpha_v"][1], g["alpha_v"]
    assert a_fd > 0 and a_gr > 0
    np.testing.assert_allclose(a_gr, a_fd, rtol=5e-2)
