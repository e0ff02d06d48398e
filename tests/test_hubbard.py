"""DFT+U (Dudarev) gates:

- potential exactness: V_U must be the exact derivative of E_U in the
  package energy pairing (dE = einsum("skmn,sknm->", ddm, V_U)/nk) — FD
  along random hermitian density perturbations,
- idempotent limit: a density whose projected occupation matrix is a 0/1
  projector has E_U = 0 (the Dudarev penalty vanishes for integer
  occupations),
- U -> 0 reduction: KRKS with U = 0 equals plain KRKS bit-for-bit,
- SCF: KRKS-LDA+U on diamond converges and shifts the energy; closed-shell
  KUKS+U matches KRKS+U; band energies at the SCF mesh reproduce the
  converged eigenvalues with the +U Fock.
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice import structure
from fftisdf_tpu.scf import hubbard as hub
from fftisdf_tpu.scf.ks import KRKS, KUKS


@pytest.fixture(scope="module")
def diamond():
    return structure.to_cell(*structure.bulk_diamond(), basis="gth-szv",
                             pseudo="gth-pade", ke_cutoff=50.0)


def _rand_system(nk=2, nao=6, nspin=2, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((nk, nao, nao)) \
        + 1j * rng.standard_normal((nk, nao, nao))
    s1e = np.einsum("kmp,knp->kmn", a, a.conj()) / nao \
        + 2.0 * np.eye(nao)[None]
    d = rng.standard_normal((nspin, nk, nao, nao)) \
        + 1j * rng.standard_normal((nspin, nk, nao, nao))
    dm = d + np.conj(np.swapaxes(d, -1, -2))
    return s1e, dm


def test_vu_is_exact_derivative_of_eu():
    s1e, dm = _rand_system()
    shalf = hub.shalf_kpts(s1e)
    sites = [(np.asarray([1, 2, 4]), 0.3), (np.asarray([0, 5]), 0.15)]
    e0, vu, _ = hub.eu_and_vu(dm, shalf, sites)
    rng = np.random.default_rng(1)
    d = rng.standard_normal(dm.shape) + 1j * rng.standard_normal(dm.shape)
    ddm = (d + np.conj(np.swapaxes(d, -1, -2))) * 1e-5
    ep, _, _ = hub.eu_and_vu(dm + ddm, shalf, sites)
    em, _, _ = hub.eu_and_vu(dm - ddm, shalf, sites)
    fd = (ep - em) / 2.0
    nk = dm.shape[1]
    an = np.einsum("skmn,sknm->", ddm, vu).real / nk
    assert abs(fd - an) < 1e-9 * max(abs(fd), 1e-8), (fd, an)


def test_idempotent_occupations_have_zero_penalty():
    s1e, _ = _rand_system(seed=2)
    nk, nao = s1e.shape[:2]
    shalf = hub.shalf_kpts(s1e)
    sinv_half = np.stack([np.linalg.inv(shalf[k]) for k in range(nk)])
    idx = np.asarray([1, 3])
    # Loewdin-frame projector occupied on exactly the site orbitals
    p = np.zeros((nao, nao))
    p[idx, idx] = 1.0
    dm = np.einsum("kmp,pq,kqn->kmn", sinv_half, p, sinv_half)[None]
    sites = [(idx, 0.7)]
    e_u, _, _ = hub.eu_and_vu(dm, shalf, sites)
    assert abs(e_u) < 1e-12
    # fractional occupation 1/2 on each of the two orbitals: maximum
    # penalty U/2 * sum n(1-n) = 0.7/2 * 2 * 1/4 per spin channel
    e_u2, _, _ = hub.eu_and_vu(0.5 * dm, shalf, sites)
    assert abs(e_u2 - 0.7 / 2.0 * 2 * 0.25) < 1e-12


def test_projector_indices_diamond(diamond):
    # gth-szv C: one s shell (1 fn) + one p shell (3 fns) per atom
    assert diamond.nao_nr() == 8
    np.testing.assert_array_equal(hub.projector_indices(diamond, 0, 1),
                                  [1, 2, 3])
    np.testing.assert_array_equal(hub.projector_indices(diamond, 1, 0),
                                  [4])
    with pytest.raises(ValueError):
        hub.projector_indices(diamond, 0, 2)


def test_krks_u_zero_reduces_to_plain(diamond):
    kpts = diamond.get_kpts([1, 1, 2])
    e0 = KRKS(diamond, kpts, xc="lda", verbose=0, conv_tol=1e-9).kernel()
    mf = KRKS(diamond, kpts, xc="lda", hubbard={0: (1, 0.0)}, verbose=0,
              conv_tol=1e-9)
    e_u0 = mf.kernel()
    assert mf.converged
    assert abs(e0 - e_u0) < 1e-10


@pytest.fixture(scope="module")
def diamond_lda_u(diamond):
    kpts = diamond.get_kpts([1, 1, 2])
    mf = KRKS(diamond, kpts, xc="lda", hubbard={0: (1, 0.2), 1: (1, 0.2)},
              verbose=0, conv_tol=1e-9)
    mf.kernel()
    assert mf.converged
    return mf


def test_krks_lda_plus_u_scf(diamond, diamond_lda_u):
    mf = diamond_lda_u
    e0 = KRKS(diamond, mf.kpts, xc="lda", verbose=0, conv_tol=1e-9).kernel()
    # U on the (fractionally occupied, covalent) C p shells must shift E
    assert abs(mf.e_tot - e0) > 1e-3
    assert mf._eu_last > 0.0      # Dudarev penalty is non-negative


def test_kuks_closed_shell_matches_krks_with_u(diamond, diamond_lda_u):
    mf_u = KUKS(diamond, diamond_lda_u.kpts, xc="lda",
                hubbard={0: (1, 0.2), 1: (1, 0.2)}, verbose=0,
                conv_tol=1e-9)
    e_u = mf_u.kernel()
    assert mf_u.converged
    assert abs(e_u - diamond_lda_u.e_tot) < 1e-7


def test_bands_with_u_reproduce_scf_eigenvalues(diamond_lda_u):
    mf = diamond_lda_u
    es, _ = mf.get_bands(mf.kpts)
    es = np.asarray(es)
    ref = np.asarray(mf.mo_energy)
    nocc = mf.nocc
    assert np.max(np.abs(es[:, :nocc + 1] - ref[:, :nocc + 1])) < 5e-5


def test_eu_vu_traced_matches_host():
    """The device-resident loop's traced +U (hubbard.eu_and_vu_traced)
    is the same math as the host version, bit-for-bit on f64."""
    import jax.numpy as jnp

    s1e, dm = _rand_system()
    shalf = hub.shalf_kpts(s1e)
    sites = [(np.asarray([1, 2, 4]), 0.3), (np.asarray([0, 5]), 0.15)]
    e0, vu0, _ = hub.eu_and_vu(dm, shalf, sites)
    e1, vu1 = hub.eu_and_vu_traced(jnp.asarray(dm), jnp.asarray(shalf),
                                   sites)
    assert abs(float(e1) - e0) < 1e-12 * max(1.0, abs(e0))
    np.testing.assert_allclose(np.asarray(vu1), vu0, atol=1e-12)


def test_device_kuks_plus_u_matches_host(diamond):
    """DFT+U traced inside the device-resident SCF loop == host KUKS+U
    (CPU f64 parity; both serve J from the same ISDF state)."""
    from fftisdf_tpu.isdf import FFTISDF
    from fftisdf_tpu.scf.ks import DeviceKUKS

    kpts = diamond.get_kpts([1, 1, 2])
    df = FFTISDF(diamond, kpts, c0=40.0, m0=(9, 9, 9), verbose=0).build()
    spec = {0: (1, 0.2), 1: (1, 0.2)}
    mf0 = KUKS(diamond, kpts, xc="lda", hubbard=spec, with_df=df,
               verbose=0, conv_tol=1e-10)
    e0 = mf0.kernel()
    mf1 = DeviceKUKS(diamond, kpts, xc="lda", hubbard=spec, with_df=df,
                     verbose=0, conv_tol=1e-10, max_cycle=60)
    e1 = mf1.kernel()
    assert mf0.converged and mf1.converged
    assert mf1._eu_last > 0.0
    np.testing.assert_allclose(e1, e0, atol=3e-8)
