"""TDA / TDDFT gates.

- CIS (TDA-HF) at gamma matches an independent dense CIS built from the
  exact plane-wave MO ERI tensor, singlet and triplet (full rank);
- KRKS(xc='hf') TDA reduces to KRHF CIS;
- the adiabatic xc kernel is the exact Hessian of the discrete Exc:
  the jvp route matches central finite differences of the vxc potential;
- k-mesh <-> supercell: the union over momentum-transfer sectors q of the
  1x1x2 TDA spectra equals the doubled-supercell gamma spectrum (pins the
  1/nk normalization of the couplings, incl. the q != 0 sector);
- Davidson matches dense diagonalization;
- full TDDFT (Casida): positive spectrum, singlet TDHF below TDA.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.scf import KRHF, KUHF
from fftisdf_tpu.scf.ks import KRKS, KUKS
from fftisdf_tpu.scf import xc as xc_mod
from fftisdf_tpu.scf.tddft import (tda, tddft, utda, momentum_matrix,
                                   oscillator_strengths, TDAOperator,
                                   density_fluctuation, dielectric_tda)
from fftisdf_tpu.utils.device import to_host
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.pw import get_eri_from_ao


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


def _dense_cis(eri, mo_e, nocc, singlet):
    """Independent molecular CIS from a dense chemists' MO ERI."""
    nmo = eri.shape[0]
    no, nv = nocc, nmo - nocc
    a = np.zeros((no, nv, no, nv), dtype=complex)
    for i in range(no):
        for aa in range(nv):
            a[i, aa, i, aa] += mo_e[nocc + aa] - mo_e[i]
    o, v = slice(None, nocc), slice(nocc, None)
    if singlet:
        a += 2.0 * np.einsum("aijb->iajb", eri[v, o, o, v])
    a -= np.einsum("abji->iajb", eri[v, v, o, o])
    m = a.reshape(no * nv, no * nv)
    return np.sort(np.linalg.eigvalsh(0.5 * (m + m.conj().T)))


@pytest.mark.parametrize("singlet", [True, False])
def test_cis_matches_exact_oracle(gamma_setup, singlet):
    cell, kpts, mf, df = gamma_setup
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))[0]
    mo = ao @ np.asarray(mf.mo_coeff)[0]
    eri_mo = np.asarray(get_eri_from_ao(
        cell, (jnp.asarray(mo),) * 4, np.zeros(3), coords))
    w_ref = _dense_cis(eri_mo, np.asarray(mf.mo_energy)[0], 1, singlet)
    w, info = tda(mf, df, q=0, singlet=singlet, nroots=0, dense=True)
    assert info["nonhermiticity"] < 1e-10
    np.testing.assert_allclose(w, w_ref, atol=1e-8)


def test_ks_hf_reduces_to_cis(gamma_setup):
    cell, kpts, mf, df = gamma_setup
    mf_ks = KRKS(cell, kpts, xc="hf", with_df=df, verbose=0,
                 conv_tol=1e-10)
    mf_ks.kernel()
    w_hf, _ = tda(mf, df, q=0, nroots=3, dense=True)
    w_ks, _ = tda(mf_ks, df, q=0, nroots=3, dense=True)
    np.testing.assert_allclose(w_ks, w_hf, atol=1e-7)


@pytest.mark.parametrize("xc", ["lda", "pbe"])
def test_fxc_hvp_matches_fd(gamma_setup, xc):
    """The kernel coupling's Hessian-vector product == central FD of the
    (itself FD-gated) vxc potential, incl. the GGA FFT-gradient terms."""
    cell, _, _, _ = gamma_setup
    spec = xc_mod.parse_xc(xc)
    fmesh = tuple(int(m) for m in cell.mesh)
    ng = int(np.prod(fmesh))
    weight = float(cell.vol) / ng
    gv = jnp.asarray(cell.get_Gv(fmesh))
    rng = np.random.default_rng(3)
    rho0 = jnp.asarray(np.stack([rng.uniform(0.1, 0.5, ng)] * 2))
    t = jnp.asarray(np.stack([rng.standard_normal(ng)] * 2))

    def vxc(r):
        return xc_mod.exc_and_vxc(r, gv, spec, fmesh, weight)[1]

    gvt = gv.T

    def total(r):
        if spec.is_gga:
            from fftisdf_tpu.linalg.fft import fft3, ifft3
            g = jnp.stack([ifft3(1j * gvt[i] * fft3(
                r.astype(jnp.complex128), fmesh), fmesh).real
                for i in range(3)], axis=1)
            sigma = jnp.stack([jnp.sum(g[0] * g[0], axis=0),
                               jnp.sum(g[0] * g[1], axis=0),
                               jnp.sum(g[1] * g[1], axis=0)])
        else:
            sigma = None
        return weight * jnp.sum(xc_mod._exc_density(r, sigma, spec))

    hvp = jax.jvp(jax.grad(total), (rho0,), (t,))[1]
    eps = 1e-6
    fd = (np.asarray(vxc(rho0 + eps * t)) -
          np.asarray(vxc(rho0 - eps * t))) / (2 * eps) * weight
    np.testing.assert_allclose(np.asarray(hvp), fd, atol=5e-5)


@pytest.mark.parametrize("singlet", [True, False])
def test_kmesh_supercell_union(singlet):
    """Union over q of the 1x1x2 TDA spectra == doubled-supercell gamma
    spectrum — the framework's k<->supercell duality for response, and
    the gate that pins the 1/nk coupling normalization."""
    lz = 7.0
    cell1 = h2_cell(nz=1, lz=lz)
    kpts1 = cell1.get_kpts([1, 1, 2])
    mf1 = KRHF(cell1, kpts1, verbose=0, conv_tol=1e-11)
    mf1.kernel()
    df1 = FFTISDF(cell1, kpts1, c0=60.0, m0=(11, 11, 13), verbose=0,
                  select_tol=1e-18, rcond=1e-12).build()
    cell2 = h2_cell(nz=2, lz=lz)
    mf2 = KRHF(cell2, np.zeros((1, 3)), verbose=0, conv_tol=1e-11)
    mf2.kernel()
    df2 = FFTISDF(cell2, np.zeros((1, 3)), c0=60.0, m0=(11, 11, 25),
                  verbose=0, select_tol=1e-18, rcond=1e-12).build()
    w_sc, _ = tda(mf2, df2, q=0, singlet=singlet, nroots=0, dense=True)
    w_union = np.sort(np.concatenate([
        tda(mf1, df1, q=q, singlet=singlet, nroots=0, dense=True)[0]
        for q in range(2)]))
    np.testing.assert_allclose(w_union, w_sc, atol=2e-4)

    if singlet:
        # Davidson vs dense on the k-mesh (exercises q=0 sector)
        w_dense, _ = tda(mf1, df1, q=0, nroots=3, dense=True)
        w_dav, info = tda(mf1, df1, q=0, nroots=3, dense=False, tol=1e-8)
        assert info["converged"]
        np.testing.assert_allclose(w_dav, w_dense, atol=1e-7)


@pytest.mark.parametrize("xc", [None, "lda"])
def test_utda_closed_shell_reduction(gamma_setup, xc):
    """Unrestricted TDA on a closed-shell reference == the union of the
    restricted singlet and triplet spectra (exact block structure)."""
    cell, kpts, mf, df = gamma_setup
    if xc is None:
        mf_r, mf_u = mf, KUHF(cell, kpts, verbose=0, conv_tol=1e-10)
    else:
        mf_r = KRKS(cell, kpts, xc=xc, with_df=df, verbose=0,
                    conv_tol=1e-10)
        mf_r.kernel()
        mf_u = KUKS(cell, kpts, xc=xc, with_df=df, verbose=0,
                    conv_tol=1e-10)
    mf_u.kernel()
    np.testing.assert_allclose(mf_u.e_tot, mf_r.e_tot, atol=1e-9)
    ws, _ = tda(mf_r, df, q=0, nroots=0, dense=True)
    wt, _ = tda(mf_r, df, q=0, singlet=False, nroots=0, dense=True)
    wu, info = utda(mf_u, df, q=0, nroots=0, dense=True)
    assert info["nonhermiticity"] < 1e-10
    union = np.sort(np.concatenate([ws, wt]))
    # the block identity is exact only at the SAME reference density; the
    # two independently-converged SCFs (whose accelerator paths differ)
    # agree to the convergence residual — conv_tol 1e-10 in energy bounds
    # the density residual near 1e-5 and the spectra near 1e-7
    np.testing.assert_allclose(wu, union, atol=1e-6)


def test_momentum_matrix_local_potential_identity():
    """Velocity-gauge matrix elements obey p_ia = (e_a - e_i) r_ia for a
    local potential (LDA + the projector-free H pseudo) in the 0D box
    where the position operator is legal — to finite-basis error.  Also
    smokes oscillator_strengths (positive, dipole-allowed root
    dominates)."""
    from fftisdf_tpu.basis.eval import eval_ao_kpts

    cell = h2_cell()
    kpts = np.zeros((1, 3))
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 trunc="0d", select_tol=1e-18, rcond=1e-12).build()
    mf = KRKS(cell, kpts, xc="lda", with_df=df, trunc="0d", verbose=0,
              conv_tol=1e-11)
    mf.kernel()
    assert mf.converged
    p = np.asarray(momentum_matrix(mf))
    coords = cell.gen_uniform_grids()
    mo = np.asarray(eval_ao_kpts(cell, coords, kpts))[0] \
        @ np.asarray(mf.mo_coeff)[0]
    w = cell.vol / coords.shape[0]
    e = np.asarray(mf.mo_energy)[0]
    r0 = coords.mean(axis=0)
    r_ia = np.stack([w * np.einsum("g,gi,ga->ia", coords[:, d] - r0[d],
                                   mo[:, :1].conj(), mo[:, 1:])
                     for d in range(3)])
    de = e[None, 1:] - e[:1, None]
    # 2-primitive basis: the commutator identity holds to ~9 %
    assert np.abs(p[:, 0] - de[None] * r_ia).max() < 0.10 * np.abs(p).max()

    wtda, info = tda(mf, df, q=0, nroots=3, dense=True)
    f = oscillator_strengths(mf, wtda, info["x"])
    assert np.all(f >= 0)
    assert f[0] > 0.1 and f[0] > 100 * f[1]   # sigma->sigma* carries it


def test_density_fluctuation_and_dielectric():
    """EELS machinery at finite q: (a) the density head obeys the
    small-q dipole limit |rho_q| ~= |q.p|/de; (b) the independent-
    particle f-sum 2 sum de |rho_q|^2 = |q|^2 N_sc / 2 holds to the
    basis error of the local-potential identity (~9 %); (c) eps_M(0) > 1
    and the loss function is non-negative."""
    cell = h2_cell(nz=1, lz=7.0)
    kpts = cell.get_kpts([1, 1, 4])
    df = FFTISDF(cell, kpts, c0=60.0, m0=(11, 11, 13), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    mf = KRKS(cell, kpts, xc="lda", with_df=df, verbose=0,
              conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    q = 1                                 # smallest mesh q, 2pi/28
    op = TDAOperator(mf, df, q=q)
    rho = np.asarray(to_host(density_fluctuation(mf, op)))
    p = np.asarray(to_host(momentum_matrix(mf)))
    qvec = kpts[q] - kpts[0]
    approx = np.einsum("d,dkia->kia", qvec, p) / op.delta
    sel = np.abs(rho).ravel() > 0.3 * np.abs(rho).max()
    ratio = (np.abs(rho).ravel() / np.abs(approx).ravel())[sel]
    assert np.all((ratio > 0.85) & (ratio < 1.15))

    ipsum = 2.0 * float(np.sum(op.delta * np.abs(rho) ** 2))
    trk = 0.5 * np.linalg.norm(qvec) ** 2 * cell.nelectron * len(kpts)
    assert 0.85 < ipsum / trk < 1.15

    eps, d = dielectric_tda(mf, df, q=q, omegas=np.linspace(0, 2, 9))
    assert eps[0].real > 1.0 and abs(eps[0].imag) < 1e-8
    assert np.all(d["loss"] > -1e-12)


def test_tddft_casida(gamma_setup):
    cell, kpts, mf, df = gamma_setup
    w_tda, _ = tda(mf, df, q=0, nroots=3, dense=True)
    w_full, info = tddft(mf, df, q=0, nroots=3)
    assert np.all(w_full > 0)
    # TDHF lowers every TDA root (B coupling is stabilizing here)
    assert np.all(w_full <= w_tda + 1e-10)
    assert w_full[0] < w_tda[0] - 1e-4
    # LDA kernel: singlet above triplet, both positive
    mf_lda = KRKS(cell, kpts, xc="lda", with_df=df, verbose=0,
                  conv_tol=1e-10)
    mf_lda.kernel()
    ws, _ = tda(mf_lda, df, q=0, nroots=2, dense=True)
    wt, _ = tda(mf_lda, df, q=0, nroots=2, singlet=False, dense=True)
    assert np.all(ws > 0) and np.all(wt > 0) and wt[0] < ws[0]
