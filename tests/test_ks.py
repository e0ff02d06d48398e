"""KS-DFT gates (no external DFT code available as oracle):

- energy/potential exactness: vxc is jax.grad of the discrete Exc, so the
  finite-difference derivative of Exc along ANY density perturbation must
  match sum(vxc * drho) * w to near machine precision — this validates the
  GGA divergence-term assembly without any hand-derived potential,
- analytic limits: Slater exchange of a uniform density has the closed-form
  value -(3/4)(3/pi)^(1/3) rho^(4/3); PBE reduces to LDA at zero density
  gradient; PW92's high-density log slope is the exact RPA coefficient
  A = (1 - ln 2)/pi^2; the exchange spin-scaling identity holds,
- reduction: KRKS(xc='hf') reproduces KRHF exactly (same functional),
- SCF: KRKS-LDA/PBE converge on diamond; ISDF-served Hartree matches the
  exact plane-wave Hartree through a full SCF; closed-shell KUKS == KRKS;
  PBE0's energy decomposes into its exact-exchange and GGA parts,
- bands: KS band energies at the SCF mesh k-points reproduce the converged
  mo_energy.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import xc as xc_mod
from fftisdf_tpu.scf.ks import KRKS, KUKS
from fftisdf_tpu.scf.hf import KRHF
from fftisdf_tpu.isdf import FFTISDF


@pytest.fixture(scope="module")
def diamond():
    return structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)


def _toy_rho(cell, seed=0, polarized=True):
    """Smooth strictly-positive spin densities on the cell mesh."""
    fmesh = tuple(int(m) for m in cell.mesh)
    ng = int(np.prod(fmesh))
    rng = np.random.default_rng(seed)
    # a few low-G plane waves on top of a constant: smooth and positive
    coef = rng.standard_normal((2, 4, 4, 4)) * 0.05
    field = np.zeros((2,) + fmesh)
    grid = np.fft.fftn(np.zeros(fmesh))
    for s in range(2):
        f = np.zeros(fmesh, dtype=complex)
        f[:4, :4, :4] = coef[s] * ng
        field[s] = np.real(np.fft.ifftn(f))
    rho = 0.3 + field - field.min()
    if not polarized:
        rho[1] = rho[0]
    return jnp.asarray(rho.reshape(2, ng))


def _exc_of(cell, rho, name):
    spec = xc_mod.parse_xc(name)
    fmesh = tuple(int(m) for m in cell.mesh)
    w = float(cell.vol) / int(np.prod(fmesh))
    gv = jnp.asarray(cell.get_Gv(fmesh))
    return xc_mod.exc_and_vxc(rho, gv, spec, fmesh, w), w


@pytest.mark.parametrize("name", ["lda", "pbe", "pbex", "pbec", "blyp",
                                  "b3lyp", "vwn5"])
def test_vxc_is_exact_derivative_of_exc(diamond, name):
    """FD of Exc along a random perturbation vs sum(vxc*drho)*w."""
    rho = _toy_rho(diamond, seed=1)
    (exc0, vxc), w = _exc_of(diamond, rho, name)
    rng = np.random.default_rng(2)
    drho = jnp.asarray(rng.standard_normal(rho.shape)) * 1e-4
    spec = xc_mod.parse_xc(name)
    fmesh = tuple(int(m) for m in diamond.mesh)
    gv = jnp.asarray(diamond.get_Gv(fmesh))
    ep, _ = xc_mod.exc_and_vxc(rho + drho, gv, spec, fmesh, w)
    em, _ = xc_mod.exc_and_vxc(rho - drho, gv, spec, fmesh, w)
    fd = (float(ep) - float(em)) / 2.0
    an = float(jnp.sum(vxc * drho)) * w
    # 1e-7 relative: central-difference truncation (h^2 * third derivative)
    # dominates; a missing/wrong GGA divergence term would err at O(1)
    assert abs(fd - an) < 1e-7 * max(abs(fd), 1e-6), (fd, an)


def test_slater_uniform_closed_form(diamond):
    """Ex/V of a uniform density: -(3/4)(3/pi)^(1/3) rho^(4/3)."""
    fmesh = tuple(int(m) for m in diamond.mesh)
    ng = int(np.prod(fmesh))
    rho0 = 0.37
    rho = jnp.full((2, ng), rho0 / 2.0)
    (exc, vxc), w = _exc_of(diamond, rho, "slater")
    # -(3/4)(3/pi)^(1/3) = -0.73855876638... (Dirac 1930 coefficient)
    expect = -(3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0) \
        * rho0 ** (4.0 / 3.0)
    assert abs(float(exc) / float(diamond.vol) - expect) < 1e-10
    # LDA exchange potential of a uniform gas: vx = -(3 rho / pi)^(1/3)
    vx_expect = -((3.0 * rho0 / np.pi) ** (1.0 / 3.0))
    assert np.allclose(np.asarray(vxc), vx_expect, atol=1e-10)


def test_pbe_reduces_to_lda_at_zero_gradient(diamond):
    fmesh = tuple(int(m) for m in diamond.mesh)
    ng = int(np.prod(fmesh))
    rho = jnp.concatenate([jnp.full((1, ng), 0.21), jnp.full((1, ng), 0.13)])
    (e_pbe, _), w = _exc_of(diamond, rho, "pbe")
    (e_lda, _), _ = _exc_of(diamond, rho, "lda")
    assert abs(float(e_pbe) - float(e_lda)) < 1e-10 * abs(float(e_lda))


def test_pw92_high_density_log_slope():
    """d eps_c / d ln rs -> A0 = (1 - ln 2)/pi^2 as rs -> 0 (exact RPA
    high-density logarithm; the PW92 A parameter equals it by design)."""
    rs = jnp.asarray([1e-7, 1e-6])
    eps = xc_mod._pw92_eps(rs, jnp.zeros(2))
    slope = (float(eps[1]) - float(eps[0])) / np.log(10.0)
    a0 = (1.0 - np.log(2.0)) / np.pi ** 2
    assert abs(slope - a0) < 0.02 * a0, (slope, a0)


@pytest.mark.parametrize("name", ["pbex", "b88"])
def test_exchange_spin_scaling(diamond, name):
    """Ex[ra, rb] = (Ex[2ra] + Ex[2rb])/2 with the RHS unpolarized."""
    rho = _toy_rho(diamond, seed=3)
    (e_pol, _), w = _exc_of(diamond, rho, name)
    e_half = []
    for s in range(2):
        r2 = jnp.stack([rho[s], rho[s]])      # unpolarized at 2 rho_s
        (e_s, _), _ = _exc_of(diamond, r2, name)
        e_half.append(float(e_s))
    assert abs(float(e_pol) - 0.5 * sum(e_half)) < 1e-10 * abs(float(e_pol))


def test_vwn5_tracks_pw92():
    """VWN5 and PW92 parameterize the same Ceperley-Alder data: eps_c
    agrees to ~1 mHa over the metallic range, and the high-density log
    slope is the same exact RPA A0 (the VWN5 paramagnetic A parameter)."""
    rs = jnp.asarray(np.geomspace(0.5, 20.0, 12))
    for z in (0.0, 0.5, 1.0):
        zeta = jnp.full_like(rs, z)
        d = np.abs(np.asarray(xc_mod._vwn5_eps(rs, zeta)
                              - xc_mod._pw92_eps(rs, zeta)))
        assert d.max() < 1.5e-3, (z, d.max())
    rs = jnp.asarray([1e-7, 1e-6])
    eps = xc_mod._vwn5_eps(rs, jnp.zeros(2))
    slope = (float(eps[1]) - float(eps[0])) / np.log(10.0)
    a0 = (1.0 - np.log(2.0)) / np.pi ** 2
    assert abs(slope - a0) < 0.02 * a0, (slope, a0)


def test_b88_uniform_reduces_to_slater(diamond):
    """At zero gradient the B88 correction vanishes identically."""
    fmesh = tuple(int(m) for m in diamond.mesh)
    ng = int(np.prod(fmesh))
    rho = jnp.concatenate([jnp.full((1, ng), 0.21), jnp.full((1, ng), 0.13)])
    (e_b88, _), _ = _exc_of(diamond, rho, "b88")
    (e_sla, _), _ = _exc_of(diamond, rho, "slater")
    assert abs(float(e_b88) - float(e_sla)) < 1e-10 * abs(float(e_sla))


def test_lyp_one_electron_density_zero():
    """LYP is exactly self-interaction-free: Ec = 0 for any fully
    spin-polarized single-channel density (the defining structural
    property of the Colle-Salvetti ansatz; both the rho_a rho_b prefactor
    and the gradient bracket cancel identically)."""
    cell = structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)
    rho = np.array(_toy_rho(cell, seed=5))
    rho[1] = 0.0
    (e_lyp, _), _ = _exc_of(cell, jnp.asarray(rho), "lyp")
    assert abs(float(e_lyp)) < 1e-8, float(e_lyp)


def test_lyp_uniform_closed_form(diamond):
    """Closed-shell uniform density: only the rs-local and the 2^{11/3}
    CF kinetic-density term survive — independent numpy arithmetic."""
    fmesh = tuple(int(m) for m in diamond.mesh)
    ng = int(np.prod(fmesh))
    rho0 = 0.37
    rho = jnp.full((2, ng), rho0 / 2.0)
    (exc, _), _ = _exc_of(diamond, rho, "lyp")
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    cf = 0.3 * (3.0 * np.pi ** 2) ** (2.0 / 3.0)
    rm13 = rho0 ** (-1.0 / 3.0)
    den = 1.0 + d * rm13
    om = np.exp(-c * rm13) / den * rho0 ** (-11.0 / 3.0)
    pair = (rho0 / 2.0) ** 2
    expect = (-4.0 * a * pair / (den * rho0)
              - a * b * om * pair * 2.0 ** (11.0 / 3.0) * cf
              * 2.0 * (rho0 / 2.0) ** (8.0 / 3.0))
    got = float(exc) / float(diamond.vol)
    assert abs(got - expect) < 1e-12, (got, expect)


def test_krks_blyp_scf(diamond):
    """BLYP SCF converges and genuinely differs from both LDA and HF."""
    kpts = diamond.get_kpts([1, 1, 2])
    mf = KRKS(diamond, kpts, xc="blyp", verbose=0, conv_tol=1e-9)
    e = mf.kernel()
    assert mf.converged
    mf_lda = KRKS(diamond, kpts, xc="lda", verbose=0, conv_tol=1e-9)
    e_lda = mf_lda.kernel()
    assert abs(e - e_lda) > 1e-3


def test_b3lyp_spec_composition():
    spec = xc_mod.parse_xc("b3lyp")
    assert spec.hyb == 0.2
    coeffs = dict((n, c) for c, n in spec.terms)
    assert coeffs == {"b88": 0.72, "slater": 0.08, "lyp": 0.81,
                      "vwn5": 0.19}


def _exc_of_mgga(cell, rho, tau, name):
    spec = xc_mod.parse_xc(name)
    fmesh = tuple(int(m) for m in cell.mesh)
    w = float(cell.vol) / int(np.prod(fmesh))
    gv = jnp.asarray(cell.get_Gv(fmesh))
    return xc_mod.exc_and_vxc_mgga(rho, tau, gv, spec, fmesh, w), w


def _tau_unif(rho):
    """Uniform-gas kinetic-energy density per spin channel:
    tau_s = (3/10)(3 pi^2)^{2/3} (2 rho_s)^{5/3} / 2."""
    return 0.3 * (3.0 * np.pi ** 2) ** (2.0 / 3.0) \
        * (2.0 * rho) ** (5.0 / 3.0) / 2.0


def test_scan_uniform_reduces_to_lda(diamond):
    """Uniform density at tau = tau_unif (alpha = 1): SCAN exchange has
    Fx = 1 and SCAN correlation collapses to PW92 (fc(1) = 0, H1(t=0) =
    0) — the defining uniform-gas constraint."""
    fmesh = tuple(int(m) for m in diamond.mesh)
    ng = int(np.prod(fmesh))
    rho = jnp.concatenate([jnp.full((1, ng), 0.21), jnp.full((1, ng), 0.13)])
    tau = _tau_unif(rho)
    (e_scan, _, _), _ = _exc_of_mgga(diamond, rho, tau, "scan")
    (e_lda, _), _ = _exc_of(diamond, rho, "lda")
    assert abs(float(e_scan) - float(e_lda)) < 1e-9 * abs(float(e_lda))


def test_scan_exchange_ge2_slope(diamond):
    """Slowly-varying limit at alpha = 1: dFx/dp -> mu_GE2 = 10/81."""
    fmesh = tuple(int(m) for m in diamond.mesh)
    ng = int(np.prod(fmesh))
    rho0 = 0.25
    p = 1e-6
    # realize p on channel variables 2 rho_s = rho0 via sigma_ss
    ckf2 = (3.0 * np.pi ** 2) ** (2.0 / 3.0)
    sig_ss = p * 4.0 * ckf2 * rho0 ** (8.0 / 3.0) / 4.0   # sigma of rho_s
    tau_w = 4.0 * sig_ss / (8.0 * rho0)                   # of the 2rho_s channel
    tau = jnp.full((2, ng), (tau_w + 0.3 * ckf2 * rho0 ** (5.0 / 3.0)) / 2.0)
    rho = jnp.full((2, ng), rho0 / 2.0)
    sigma = jnp.stack([jnp.full(ng, sig_ss), jnp.full(ng, sig_ss),
                       jnp.full(ng, sig_ss)])
    e_x = xc_mod._scan_x(rho, sigma, tau)
    e_lda = xc_mod._uniform_x(rho)
    fx = float(e_x[0]) / float(e_lda[0])
    slope = (fx - 1.0) / p
    assert abs(slope - 10.0 / 81.0) < 1e-2 * (10.0 / 81.0), slope


def test_scan_one_electron_correlation_zero(diamond):
    """Fully spin-polarized one-orbital density (tau = tau_W, alpha = 0):
    SCAN correlation vanishes (fc(0) = 1 routes to eps0, and
    Gc(zeta = 1) = 0 kills it) — SCAN is one-electron SIC-free."""
    rho = np.array(_toy_rho(diamond, seed=7))
    rho[1] = 0.0
    rho_j = jnp.asarray(rho)
    spec = xc_mod.parse_xc("scanc")
    fmesh = tuple(int(m) for m in diamond.mesh)
    gv = jnp.asarray(diamond.get_Gv(fmesh))
    g = xc_mod._grad_fft(rho_j, gv.T, fmesh)
    sig_aa = jnp.sum(g[0] * g[0], axis=0)
    tau = jnp.stack([sig_aa / (8.0 * rho_j[0]), jnp.zeros_like(rho_j[0])])
    e = xc_mod._scan_c(rho_j, jnp.stack([sig_aa, 0 * sig_aa, 0 * sig_aa]),
                       tau)
    w = float(diamond.vol) / int(np.prod(fmesh))
    assert abs(float(jnp.sum(e)) * w) < 1e-8


def test_scan_vrho_vtau_are_exact_derivatives(diamond):
    """FD of Exc along joint (drho, dtau) perturbations vs the returned
    (v_rho, v_tau) pair — validates the meta-GGA autodiff path."""
    rho = _toy_rho(diamond, seed=4)
    tau = _tau_unif(rho) * 1.3 + 0.05   # above tau_W = 0 for uniform-free rho
    (exc0, vr, vt), w = _exc_of_mgga(diamond, rho, tau, "scan")
    rng = np.random.default_rng(8)
    drho = jnp.asarray(rng.standard_normal(rho.shape)) * 1e-4
    dtau = jnp.asarray(rng.standard_normal(rho.shape)) * 1e-4
    (ep, _, _), _ = _exc_of_mgga(diamond, rho + drho, tau + dtau, "scan")
    (em, _, _), _ = _exc_of_mgga(diamond, rho - drho, tau - dtau, "scan")
    fd = (float(ep) - float(em)) / 2.0
    an = float(jnp.sum(vr * drho) + jnp.sum(vt * dtau)) * w
    assert abs(fd - an) < 1e-6 * max(abs(fd), 1e-6), (fd, an)


def test_scan_exchange_spin_scaling(diamond):
    """Ex[ra, rb] = (Ex[2ra] + Ex[2rb])/2 including the tau channels."""
    rho = _toy_rho(diamond, seed=3)
    tau = _tau_unif(rho) * jnp.asarray([[1.2], [1.4]])
    (e_pol, _, _), _ = _exc_of_mgga(diamond, rho, tau, "scanx")
    e_half = []
    for s in range(2):
        r2 = jnp.stack([rho[s], rho[s]])
        t2 = jnp.stack([tau[s], tau[s]])
        (e_s, _, _), _ = _exc_of_mgga(diamond, r2, t2, "scanx")
        e_half.append(float(e_s))
    assert abs(float(e_pol) - 0.5 * sum(e_half)) < 1e-10 * abs(float(e_pol))


def test_krks_scan_scf_and_fock_consistency(diamond):
    """SCAN SCF converges, and the meta-GGA Vxc (including the
    generalized-KS tau term) is the exact derivative of Exc w.r.t. the
    density matrix: FD along a random hermitian ddm matches
    Tr(ddm Vxc)/nk — this gates the whole tau Fock plumbing (Bloch AO
    FFT gradients, get_tau, vtau_matrix) at once."""
    from fftisdf_tpu.scf.ks import _xc_fock_kernel

    kpts = diamond.get_kpts([1, 1, 2])
    mf = KRKS(diamond, kpts, xc="scan", verbose=0, conv_tol=1e-9)
    e = mf.kernel()
    assert mf.converged
    nk = len(kpts)
    dm = mf.dm
    rng = np.random.default_rng(11)
    ddm = rng.standard_normal((nk,) + dm.shape[1:]) * 1e-4
    ddm = ddm + ddm.transpose(0, 2, 1)

    def exc_of(d):
        exc, vxc, _ = _xc_fock_kernel(
            mf._ao, mf._dm_device(d)[None], mf._gv, mf._spec, mf._fmesh,
            mf._xc_weight, nk, 1, coords=mf._coords, kpts=mf._kpts_arr)
        return float(exc), vxc

    e0, vxc = exc_of(dm)
    ep, _ = exc_of(dm + ddm)
    em, _ = exc_of(dm - ddm)
    fd = (ep - em) / 2.0
    an = float(np.einsum("kmn,knm->", ddm,
                         np.asarray(vxc)[0]).real) / nk
    assert abs(fd - an) < 1e-7 * max(abs(fd), 1e-8), (fd, an)
    # bands reproduce the SCF eigenvalues through the mgga band path
    es, _ = mf.get_bands(mf.kpts)
    ref = np.asarray(mf.mo_energy)
    nocc = mf.nocc
    assert np.max(np.abs(np.asarray(es)[:, :nocc] - ref[:, :nocc])) < 5e-5


def test_krks_hf_reduces_to_krhf(diamond):
    kpts = diamond.get_kpts([1, 1, 2])
    mf_hf = KRHF(diamond, kpts, verbose=0, conv_tol=1e-9)
    e_hf = mf_hf.kernel()
    mf_ks = KRKS(diamond, kpts, xc="hf", verbose=0, conv_tol=1e-9)
    e_ks = mf_ks.kernel()
    assert mf_ks.converged
    assert abs(e_hf - e_ks) < 1e-8


@pytest.fixture(scope="module")
def diamond_lda(diamond):
    kpts = diamond.get_kpts([1, 1, 2])
    mf = KRKS(diamond, kpts, xc="lda", verbose=0, conv_tol=1e-9)
    mf.kernel()
    assert mf.converged
    return mf


def test_krks_lda_scf(diamond, diamond_lda):
    mf = diamond_lda
    # the density must integrate to the electron count on the grid
    dm_dev = mf._dm_device(mf.dm)
    _, _, nelec = mf._xc_eval(dm_dev[None], nspin=1)
    assert abs(nelec - diamond.nelectron) < 1e-4
    # LDA total energy differs from HF (sanity that xc actually acted)
    mf_hf = KRHF(diamond, mf.kpts, verbose=0)
    e_hf = mf_hf.kernel()
    assert abs(mf.e_tot - e_hf) > 1e-2


def test_krks_pbe_scf_and_isdf_hartree(diamond):
    """PBE SCF with ISDF-served Hartree vs exact plane-wave Hartree."""
    kpts = diamond.get_kpts([1, 1, 2])
    mf = KRKS(diamond, kpts, xc="pbe", verbose=0, conv_tol=1e-9)
    e_pw = mf.kernel()
    assert mf.converged
    df = FFTISDF(diamond, kpts, c0=40.0, verbose=0).build()
    mf_i = KRKS(diamond, kpts, xc="pbe", with_df=df, verbose=0,
                conv_tol=1e-9)
    e_isdf = mf_i.kernel()
    assert mf_i.converged
    assert abs(e_pw - e_isdf) / diamond.natm < 5e-7, (e_pw, e_isdf)


def test_pbe0_energy_decomposition(diamond):
    """At a fixed density, E_elec(pbe0) = e1 + ej + 0.25 Ex_exact
    + 0.75 Ex_pbe + Ec_pbe."""
    kpts = diamond.get_kpts([1, 1, 2])
    mf = KRKS(diamond, kpts, xc="pbe0", verbose=0)
    dm = mf.get_init_guess()
    fock, vj, vk = mf.get_fock(dm)
    e_pbe0 = mf.energy_elec(dm, vj, vk)
    nk = len(kpts)
    e1 = np.einsum("kmn,knm->", dm, mf.h1e).real / nk
    ej = 0.5 * np.einsum("kmn,knm->", dm, vj).real / nk
    # get_fock returns the EFFECTIVE scaled exchange matrix (hyb*K, plus
    # any hyb_sr*K_SR for screened hybrids) — no extra 0.25 factor here
    ex_hf = -0.25 * np.einsum("kmn,knm->", dm, vk).real / nk
    dm_dev = mf._dm_device(dm)[None]
    from fftisdf_tpu.scf.ks import _xc_pot_kernel
    args = (mf._ao, dm_dev, mf._gv)
    kw = dict(fmesh=mf._fmesh, weight=mf._xc_weight, nk=nk, nspin=1)
    ex_pbe, _, _ = _xc_pot_kernel(*args, spec=xc_mod.parse_xc("pbex"), **kw)
    ec_pbe, _, _ = _xc_pot_kernel(*args, spec=xc_mod.parse_xc("pbec"), **kw)
    manual = e1 + ej + ex_hf + 0.75 * float(ex_pbe) + float(ec_pbe)
    assert abs(e_pbe0 - manual) < 1e-9, (e_pbe0, manual)


def test_kuks_closed_shell_matches_krks(diamond, diamond_lda):
    kpts = diamond.get_kpts([1, 1, 2])
    mf_u = KUKS(diamond, kpts, xc="lda", verbose=0, conv_tol=1e-9)
    e_u = mf_u.kernel()
    assert mf_u.converged
    assert abs(e_u - diamond_lda.e_tot) < 1e-7


@pytest.fixture(scope="module")
def diamond_isdf(diamond):
    kpts = diamond.get_kpts([1, 1, 2])
    df = FFTISDF(diamond, kpts, c0=40.0, m0=(9, 9, 9), verbose=0).build()
    return kpts, df


def test_device_krks_matches_host(diamond, diamond_isdf):
    """Device-resident KS loop == host KS loop (CPU f64 parity gate,
    mirroring tests/test_scf_device.py for HF)."""
    from fftisdf_tpu.scf.ks import DeviceKRKS

    kpts, df = diamond_isdf
    e0 = KRKS(diamond, kpts, xc="pbe", with_df=df, verbose=0,
              conv_tol=1e-10).kernel()
    mf = DeviceKRKS(diamond, kpts, xc="pbe", with_df=df, verbose=0,
                    conv_tol=1e-10, max_cycle=60)
    e1 = mf.kernel()
    assert mf.converged
    np.testing.assert_allclose(e1, e0, atol=3e-8)


def test_device_kuks_hybrid_matches_host(diamond, diamond_isdf):
    """Hybrid (PBE0) exercises the exact-exchange branch of the traced
    device veff; both sides serve K from the same ISDF state."""
    from fftisdf_tpu.scf.ks import DeviceKUKS

    kpts, df = diamond_isdf
    mf0 = KUKS(diamond, kpts, xc="pbe0", with_df=df, verbose=0,
               conv_tol=1e-10)
    e0 = mf0.kernel()
    mf1 = DeviceKUKS(diamond, kpts, xc="pbe0", with_df=df, verbose=0,
                     conv_tol=1e-10, max_cycle=60)
    e1 = mf1.kernel()
    assert mf0.converged and mf1.converged
    np.testing.assert_allclose(e1, e0, atol=3e-8)


def test_ks_bands_reproduce_scf_eigenvalues(diamond, diamond_lda):
    mf = diamond_lda
    es, cs = mf.get_bands(mf.kpts)
    es = np.asarray(es)
    # compare occupied + low virtual eigenvalues at the SCF mesh points
    ref = np.asarray(mf.mo_energy)
    nocc = mf.nocc
    assert np.max(np.abs(es[:, :nocc + 1] - ref[:, :nocc + 1])) < 5e-5
