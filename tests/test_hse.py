"""HSE06 screened-hybrid gates.

The reference guards all range separation out (``/root/reference/
fftisdf.py:392-396``); here HSE06 = PBE + 0.25 (SR-HF(omega) -
SR-PBE(omega)), omega = 0.11, with the erfc-screened exact exchange
served from the SAME ISDF interpolation basis (FFTISDF.get_wq_omega).
Gates (no external DFT oracle available):

- HJS closed form: F(0, 0) = 1 (LDA limit); F(s, 0) tracks the PBE
  enhancement factor over s in [0, 8] at the ~1e-4 accuracy of the HJS
  hole fit (JCP 128, 194105 (2008)); full screening kills it,
- omega limits of the SR term energy density: omega -> 0 recovers PBE
  exchange, omega -> inf vanishes,
- SR exchange potential is the exact derivative of the SR energy (FD),
- SCF: HSE06 converges on diamond; its energy decomposes into the PBE
  part plus 0.25 (SR-HF - SR-PBE); a large-omega HSE-form functional
  reduces to plain PBE through a full SCF,
- device-resident HSE06 veff == host HSE06 (the screened image-space
  metric rides as a jit argument),
- band energies at the SCF mesh reproduce mo_energy (the band path
  assembles SR exchange through the exact plane-wave pair sweep).
"""
from functools import partial

import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import xc as xc_mod
from fftisdf_tpu.scf.ks import KRKS, KUKS
from fftisdf_tpu.isdf import FFTISDF


# ---- HJS enhancement factor (pure function gates) ----------------------

def _f_pbe(s2):
    k, mu = 0.804, 0.2195149727645171
    return 1.0 + k - k / (1.0 + mu * s2 / k)


def test_hjs_lda_limit():
    f = float(xc_mod._hjs_fx_sr(jnp.asarray(0.0), jnp.asarray(1e-10)))
    assert abs(f - 1.0) < 1e-6


def test_hjs_tracks_pbe_at_omega_zero():
    s = np.linspace(0.0, 8.0, 33)
    f = np.asarray(xc_mod._hjs_fx_sr(jnp.asarray(s * s),
                                     jnp.asarray(1e-10)))
    ref = _f_pbe(s * s)
    # the HJS H(s) fit reproduces the PBE hole to ~1e-4 (their Table I
    # regime); a transposed polynomial or a wrong zeta = s^2 H(s)
    # convention errs at the percent level
    assert np.max(np.abs(f - ref) / ref) < 1e-3


def test_hjs_fully_screened_vanishes():
    s2 = jnp.asarray([0.0, 1.0, 9.0])
    f = np.asarray(xc_mod._hjs_fx_sr(s2, jnp.asarray(50.0)))
    assert np.max(np.abs(f)) < 1e-3


def _toy(ng=512, seed=3):
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(0.05 + rng.random((2, ng)))
    sigma = rng.random((3, ng))
    sigma[1] = 0.0
    return rho, jnp.asarray(sigma)


def test_wpbe_omega_limits():
    rho, sigma = _toy()
    e_pbe = np.asarray(xc_mod._pbe_x(rho, sigma))
    e_w0 = np.asarray(xc_mod._wpbe_x(rho, sigma, omega=1e-7))
    e_winf = np.asarray(xc_mod._wpbe_x(rho, sigma, omega=1e3))
    scale = np.abs(e_pbe).max()
    assert np.max(np.abs(e_w0 - e_pbe)) < 2e-3 * scale
    assert np.max(np.abs(e_winf)) < 1e-5 * scale


def test_hse06_spec():
    spec = xc_mod.parse_xc("hse06")
    assert spec.hyb == 0.0
    assert spec.hyb_sr == 0.25
    assert abs(spec.omega - 0.11) < 1e-12
    assert spec.is_gga and not spec.is_mgga
    names = [t[1] for t in spec.terms]
    assert "wpbexhse" in names and "pbex" in names and "pbec" in names


def test_wpbe_potential_is_exact_derivative(diamond_cell=None):
    """FD of the SR-exchange Exc along a random drho vs sum(vxc*drho)*w."""
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    fmesh = tuple(int(m) for m in cell.mesh)
    ng = int(np.prod(fmesh))
    rng = np.random.default_rng(5)
    f = np.zeros(fmesh, dtype=complex)
    f[:3, :3, :3] = rng.standard_normal((3, 3, 3)) * 0.03 * ng
    field = np.real(np.fft.ifftn(f))
    rho = np.stack([0.2 + field - field.min()] * 2).reshape(2, ng)
    rho = jnp.asarray(rho)
    w = float(cell.vol) / ng
    gv = jnp.asarray(cell.get_Gv(fmesh))
    spec = xc_mod.parse_xc("wpbexhse")
    (exc0, vxc), _ = (xc_mod.exc_and_vxc(rho, gv, spec, fmesh, w), w)
    drho = jnp.asarray(rng.standard_normal(rho.shape)) * 1e-4
    ep, _ = xc_mod.exc_and_vxc(rho + drho, gv, spec, fmesh, w)
    em, _ = xc_mod.exc_and_vxc(rho - drho, gv, spec, fmesh, w)
    fd = (float(ep) - float(em)) / 2.0
    an = float(jnp.sum(vxc * drho)) * w
    assert abs(fd - an) < 1e-7 * max(abs(fd), 1e-6), (fd, an)


# ---- SCF-level gates ----------------------------------------------------

@pytest.fixture(scope="module")
def diamond():
    return structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)


@pytest.fixture(scope="module")
def diamond_isdf(diamond):
    kpts = diamond.get_kpts([1, 1, 2])
    df = FFTISDF(diamond, kpts, c0=40.0, m0=(9, 9, 9), verbose=0).build()
    return kpts, df


@pytest.fixture(scope="module")
def diamond_hse(diamond, diamond_isdf):
    kpts, df = diamond_isdf
    mf = KRKS(diamond, kpts, xc="hse06", with_df=df, verbose=0,
              conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    return mf


def test_hse06_energy_decomposition(diamond, diamond_isdf, diamond_hse):
    """E[HSE06] == E_1e + E_J + E_xc[PBE - 0.25 wPBE] - 0.25/2 tr(D K_SR)/nk
    reassembled from independently served pieces at the converged density."""
    kpts, df = diamond_isdf
    mf = diamond_hse
    dm = mf.dm
    dm_dev = mf._dm_device(dm)
    vj, vk_eff = mf._exx_matrices(dm_dev)
    _, vk_sr = df.get_jk(dm_dev, with_j=False, omega=-0.11)
    from fftisdf_tpu.utils.device import to_host
    vk_sr = np.asarray(to_host(vk_sr))
    # vk_eff must be exactly 0.25 * K_SR (no full-range exchange in HSE06)
    np.testing.assert_allclose(vk_eff, 0.25 * vk_sr, atol=1e-10)
    nk = len(kpts)
    exc, _, _ = mf._xc_eval(dm_dev[None], nspin=1)
    e1 = np.einsum("kmn,knm->", dm, mf.h1e).real / nk
    ej = 0.5 * np.einsum("kmn,knm->", dm, vj).real / nk
    ex = -0.25 * 0.25 * np.einsum("kmn,knm->", dm, vk_sr).real / nk
    np.testing.assert_allclose(e1 + ej + ex + exc + mf.e_nuc, mf.e_tot,
                               atol=1e-8)


def test_hse_large_omega_reduces_to_pbe(diamond, diamond_isdf):
    """An HSE-form functional at omega = 25 has (numerically) no SR term
    left on a mesh of this cutoff: full SCF == plain PBE."""
    kpts, df = diamond_isdf
    key_t, key_f = "_wpbex25_test", "_hse25_test"
    xc_mod._TERMS[key_t] = (partial(xc_mod._wpbe_x, omega=25.0), 1)
    xc_mod._FUNCTIONALS[key_f] = xc_mod.XCSpec(
        key_f, 0.0, ((1.0, "pbex"), (-0.25, key_t), (1.0, "pbec")),
        hyb_sr=0.25, omega=25.0)
    try:
        e_pbe = KRKS(diamond, kpts, xc="pbe", with_df=df, verbose=0,
                     conv_tol=1e-10).kernel()
        e_hse = KRKS(diamond, kpts, xc=key_f, with_df=df, verbose=0,
                     conv_tol=1e-10).kernel()
    finally:
        xc_mod._TERMS.pop(key_t)
        xc_mod._FUNCTIONALS.pop(key_f)
    # SR kernel magnitude ~ pi/omega^2 = 5e-3 * 0.25 fraction, and the
    # SR-PBE term cancels most of the SR-HF remainder
    np.testing.assert_allclose(e_hse, e_pbe, atol=2e-4)


def test_device_hse06_matches_host(diamond, diamond_isdf, diamond_hse):
    """Device-resident HSE06 veff (screened ws as a jit argument) == host."""
    from fftisdf_tpu.scf.ks import DeviceKRKS

    kpts, df = diamond_isdf
    mf1 = DeviceKRKS(diamond, kpts, xc="hse06", with_df=df, verbose=0,
                     conv_tol=1e-10, max_cycle=60)
    e1 = mf1.kernel()
    assert mf1.converged
    np.testing.assert_allclose(e1, diamond_hse.e_tot, atol=3e-8)


def test_hse06_bands_reproduce_scf_eigenvalues(diamond_hse):
    """get_bands at the SCF k-points == converged mo_energy (exercises the
    plane-wave SR-exchange band assembly against the ISDF-served SCF)."""
    mf = diamond_hse
    es, _ = mf.get_bands(mf.kpts)
    es = np.asarray(es)
    ref = np.asarray(mf.mo_energy)
    nocc = mf.nocc
    # band-path SR-K comes from the exact pair sweep while the SCF serves
    # it from the compressed ISDF metric: agreement to compression error
    assert np.max(np.abs(es[:, :nocc + 1] - ref[:, :nocc + 1])) < 5e-5


# ---- screened-hybrid derivatives ---------------------------------------

def _he2_cell(dz=0.0, a_mat=None, box=8.0, mesh=14):
    from fftisdf_tpu.lattice.cell import Cell, Shell

    shells = [Shell(l=0, exps=np.array([0.8, 0.3]),
                    coeffs=np.array([[0.4], [0.7]]))]
    a = np.diag([box, box, box]) if a_mat is None else a_mat
    frac = np.array([[0.5, 0.5, 0.35], [0.5, 0.5, 0.65 + dz / box]])
    return Cell(
        a=a,
        atom=[("He", frac[0] @ a), ("He", frac[1] @ a)],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_hse06_forces_vs_finite_difference():
    """Central-difference force gate for the screened hybrid: the
    SR-exchange term (erfc kernel, incl. its finite q+G=0 sample) and the
    SR-wPBE Pulay force must both be exact in the traced Lagrangian."""
    from fftisdf_tpu.scf import grad as scf_grad

    kmesh = [1, 1, 2]

    def scf(dz=0.0):
        cell = _he2_cell(dz=dz)
        mf = KRKS(cell, cell.get_kpts(kmesh), xc="hse06", verbose=0,
                  conv_tol=1e-12)
        mf.kernel()
        assert mf.converged
        return mf

    mf0 = scf()
    g, val = scf_grad.kernel(mf0, two_electron="pw")
    np.testing.assert_allclose(val, mf0.e_tot, atol=1e-9)

    h = 2e-3
    fd = (scf(+h).e_tot - scf(-h).e_tot) / (2 * h)
    # 1e-6 like the SCAN gate: central-difference truncation at h=2e-3
    # (measured 6e-7 on this fixture) dominates the analytic error
    np.testing.assert_allclose(g[1, 2], fd, atol=1e-6)
    np.testing.assert_allclose(g[0, 2], -g[1, 2], atol=5e-6)


def test_hse06_stress_vs_fd():
    """Strain gate for the screened hybrid: the SR kernel's screen factor
    exp(-|q+G|^2/4w^2) is strain-dependent (unlike the q+G=0 value
    pi/w^2), and its contribution must match central FD of re-converged
    energies."""
    from fftisdf_tpu.scf import stress as scf_stress

    def scf_ks(a_mat=None):
        cell = _he2_cell(a_mat=a_mat)
        mf = KRKS(cell, cell.get_kpts([1, 1, 2]), xc="hse06", verbose=0,
                  conv_tol=1e-11)
        mf.kernel()
        assert mf.converged
        return mf

    mf = scf_ks()
    a0 = np.asarray(mf.cell.a)
    vol = float(mf.cell.vol)
    sigma, pressure, val = scf_stress.kernel(mf)
    np.testing.assert_allclose(val, mf.e_tot, atol=1e-9)

    h = 1e-4
    exx = np.zeros((3, 3))
    exx[0, 0] = 1.0
    es = [scf_ks(a0 @ (np.eye(3) + s * exx)).e_tot for s in (+h, -h)]
    fd_xx = (es[0] - es[1]) / (2 * h)
    np.testing.assert_allclose(vol * sigma[0, 0], fd_xx,
                               rtol=2e-5, atol=5e-7)


def test_isdf_state_multi_kernel_matches_build():
    """isdf_state_fn(omegas=...) returns (bare, screened) metrics that
    match the non-differentiable build's wq / get_wq_omega at the same
    frozen interpolation points (incl. the TRS mirror scatter)."""
    from fftisdf_tpu.isdf.autodiff import isdf_state_fn
    from fftisdf_tpu.lattice.cell import Cell

    cell = Cell(
        a=np.diag([5.0, 5.0, 7.0]),
        atom=[("He", (2.5, 2.5, 2.0)), ("He", (2.5, 2.5, 4.5))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([15, 15, 21]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts([1, 1, 2])
    df = FFTISDF(cell, kpts, c0=20.0, m0=(7, 7, 9), verbose=0).build()
    wq_sr_ref = np.asarray(df.get_wq_omega(-0.6))
    state = isdf_state_fn(cell, kpts, df.mask, m0=df.m0, solver=df.solver,
                          rcond=df.rcond, omegas=(-0.6,))
    x_k, wq = state(jnp.asarray(cell.atom_coords()))
    assert wq.shape[0] == 2
    # vs the build: 5e-6*scale, the state-vs-streaming-pipeline agreement
    # of test_autodiff (different solve path through an ill-conditioned
    # x4); vs the single-kernel state: near-exact (identical path)
    scale = np.abs(np.asarray(df.wq)).max()
    assert np.abs(np.asarray(wq[0]) - np.asarray(df.wq)).max() < 5e-6 * scale
    assert np.abs(np.asarray(wq[1]) - wq_sr_ref).max() < 5e-6 * scale
    state1 = isdf_state_fn(cell, kpts, df.mask, m0=df.m0, solver=df.solver,
                           rcond=df.rcond)
    _, wq_single = state1(jnp.asarray(cell.atom_coords()))
    assert np.abs(np.asarray(wq[0]) - np.asarray(wq_single)).max() \
        < 1e-10 * scale


# ---- screened-hybrid response (TDA/TDDFT) -------------------------------

@pytest.fixture(scope="module")
def h2_gamma():
    from fftisdf_tpu.lattice.cell import Cell, Shell

    cell = Cell(
        a=np.diag([6.0, 6.0, 7.0]),
        atom=[("H", (3.0, 3.0, 1.8)), ("H", (3.0, 3.0, 3.2))],
        basis={"H": [Shell(l=0, exps=np.array([1.2, 0.4]),
                           coeffs=np.eye(2))]},
        pseudo="gth-pade",
        mesh=np.array([14, 14, 15]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = np.zeros((1, 3))
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    return cell, kpts, df


def test_hse06_utda_closed_shell_reduction(h2_gamma):
    """Unrestricted HSE06 TDA on a closed-shell reference == the union of
    the restricted singlet and triplet spectra — exercises the SR-exchange
    coupling block (erfc-screened metric) in both operators, plus
    hermiticity of the assembled response matrix."""
    from fftisdf_tpu.scf.tddft import tda, utda

    cell, kpts, df = h2_gamma
    mf_r = KRKS(cell, kpts, xc="hse06", with_df=df, verbose=0,
                conv_tol=1e-10)
    mf_r.kernel()
    assert mf_r.converged
    mf_u = KUKS(cell, kpts, xc="hse06", with_df=df, verbose=0,
                conv_tol=1e-10)
    mf_u.kernel()
    np.testing.assert_allclose(mf_u.e_tot, mf_r.e_tot, atol=1e-9)
    ws, _ = tda(mf_r, df, q=0, nroots=0, dense=True)
    wt, _ = tda(mf_r, df, q=0, singlet=False, nroots=0, dense=True)
    wu, info = utda(mf_u, df, q=0, nroots=0, dense=True)
    assert info["nonhermiticity"] < 1e-10
    union = np.sort(np.concatenate([ws, wt]))
    np.testing.assert_allclose(wu, union, atol=1e-8)


def test_hse_tda_large_omega_reduces_to_pbe(h2_gamma):
    """TDA spectrum of the HSE form at omega = 25 == PBE TDA: both the
    SR-exchange coupling block and the SR-wPBE kernel term vanish."""
    from fftisdf_tpu.scf.tddft import tda

    cell, kpts, df = h2_gamma
    key_t, key_f = "_wpbex25_tda_test", "_hse25_tda_test"
    xc_mod._TERMS[key_t] = (partial(xc_mod._wpbe_x, omega=25.0), 1)
    xc_mod._FUNCTIONALS[key_f] = xc_mod.XCSpec(
        key_f, 0.0, ((1.0, "pbex"), (-0.25, key_t), (1.0, "pbec")),
        hyb_sr=0.25, omega=25.0)
    try:
        mf_p = KRKS(cell, kpts, xc="pbe", with_df=df, verbose=0,
                    conv_tol=1e-10)
        mf_p.kernel()
        mf_h = KRKS(cell, kpts, xc=key_f, with_df=df, verbose=0,
                    conv_tol=1e-10)
        mf_h.kernel()
        w_p, _ = tda(mf_p, df, q=0, nroots=3, dense=True)
        w_h, _ = tda(mf_h, df, q=0, nroots=3, dense=True)
    finally:
        xc_mod._TERMS.pop(key_t)
        xc_mod._FUNCTIONALS.pop(key_f)
    np.testing.assert_allclose(w_h, w_p, atol=3e-4)
