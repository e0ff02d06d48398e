"""k <-> supercell "stripe" duality identities, re-derived and unit-tested.

This formalizes the reference's derivation scripts
``fftisdf-supercell-{1..5}.py`` (SURVEY.md section 2a #13-14) as pytest gates:

1. the quartic normal matrix: stripe-trick x4_k[q] equals the direct
   momentum-conserving sum (1/sqrt(nk)) sum_k x2[k] (.) x2[q-k];
2. the RHS sector identity: stripe y_k[q] equals
   (1/sqrt(nk)) sum_k fx[k] (.) conj(fx[k+q]) — the least-squares
   normal-equation RHS;
3. reality of stripe representations (the asserts at fftisdf.py:43,81);
4. P[-R] = P[R]^T for time-reversal-symmetric densities (the transpose in
   get_k_kpts, ref fftisdf.py:219);
5. the "identical, but wrong!" lesson (fftisdf-supercell-2.py:188-201): the
   tempting conjugated back-transform phase.conj() in the RHS does NOT give
   the correct sector decomposition.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell
from fftisdf_tpu.lattice import kpoints as kpt_mod
from fftisdf_tpu.basis.eval import eval_ao_kpts
from fftisdf_tpu.isdf.kpoint import _stripe_quartic, _rhs_block


@pytest.fixture(scope="module")
def setup():
    cell = Cell(
        a=np.diag([4.0, 4.0, 5.0]),
        atom=[("He", (2.0, 2.0, 2.5))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([9, 9, 11]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kmesh = [2, 1, 3]
    kpts = cell.get_kpts(kmesh)
    phase = kpt_mod.get_phase(cell, kpts, kmesh)
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    # "interpolation vectors": AO values at a few grid points
    x_k = jnp.asarray(ao[:, ::97, :])  # (nk, nip, nao)
    return cell, kpts, phase, coords, ao, x_k


def kconserv_index(cell, kpts):
    return kpt_mod.get_kconserv2(cell, kpts)


def test_x4_stripe_equals_direct_sum(setup):
    cell, kpts, phase, coords, ao, x_k = setup
    nk = len(kpts)
    x4_k = np.asarray(_stripe_quartic(x_k, jnp.asarray(phase)))
    # direct: A^q = sum_k x2[k] (.) x2[q-k], q-k index via kconserv tables
    x2 = np.einsum("kIm,kJm->kIJ", np.asarray(x_k).conj(), np.asarray(x_k))
    s = cell.get_scaled_kpts(kpts)
    direct = np.zeros_like(x2)
    for qi in range(nk):
        for ki in range(nk):
            kmi = kpt_mod.member(s[qi] - s[ki], s)  # q - k
            direct[qi] += x2[ki] * x2[kmi]
    np.testing.assert_allclose(x4_k, direct / np.sqrt(nk), atol=1e-10)


def test_rhs_stripe_equals_normal_equations(setup):
    cell, kpts, phase, coords, ao, x_k = setup
    nk = len(kpts)
    f_k = jnp.asarray(ao[:, :300, :])
    y_k = np.asarray(_rhs_block(f_k, x_k, jnp.asarray(phase)))
    fx = np.einsum("kgm,kIm->kgI", np.asarray(f_k).conj(), np.asarray(x_k))
    s = cell.get_scaled_kpts(kpts)
    direct = np.zeros_like(fx)
    for qi in range(nk):
        for ki in range(nk):
            kpi = kpt_mod.member(s[ki] + s[qi], s)  # k + q
            direct[qi] += fx[ki] * fx[kpi].conj()
    np.testing.assert_allclose(y_k, direct / np.sqrt(nk), atol=1e-10)


def test_stripe_reality(setup):
    cell, kpts, phase, coords, ao, x_k = setup
    x2_k = jnp.einsum("kIm,kJm->kIJ", x_k.conj(), x_k)
    x2_s = np.einsum("Rk,kIJ->RIJ", phase, np.asarray(x2_k))
    assert abs(x2_s.imag).max() < 1e-10  # ref assert fftisdf.py:43
    fx = np.einsum("kgm,kIm->kgI", np.asarray(ao[:, :200]).conj(),
                   np.asarray(x_k))
    fx_s = np.einsum("Rk,kgI->RgI", phase, fx)
    assert abs(fx_s.imag).max() < 1e-10  # ref assert fftisdf.py:81


def test_trs_density_transpose_identity(setup):
    cell, kpts, phase, coords, ao, x_k = setup
    nk = len(kpts)
    rng = np.random.default_rng(0)
    nao = ao.shape[2]
    s = cell.get_scaled_kpts(kpts)
    dm = rng.standard_normal((nk, nao, nao)) + 1j * rng.standard_normal((nk, nao, nao))
    dm = dm + dm.conj().transpose(0, 2, 1)
    for k in range(nk):
        km = kpt_mod.member(-s[k], s)
        if km < k:
            continue
        avg = (dm[k] + dm[km].conj()) / 2
        dm[k] = avg
        dm[km] = avg.conj()
    rhok = np.einsum("kIm,kmn,kJn->kIJ", np.asarray(x_k), dm,
                     np.asarray(x_k).conj())
    rhos = np.einsum("Rk,kIJ->RIJ", phase, rhok)
    assert abs(rhos.imag).max() < 1e-10
    # P[-R] = P[R]^T: image -R is the modular negation of the image index
    kmesh = [2, 1, 3]
    ints = np.stack(np.meshgrid(*[np.arange(m) for m in kmesh],
                                indexing="ij"), -1).reshape(-1, 3)
    for R in range(len(ints)):
        negR = [(-ints[R][d]) % kmesh[d] for d in range(3)]
        Rm = int(np.where((ints == negR).all(axis=1))[0][0])
        np.testing.assert_allclose(rhos[Rm].real, rhos[R].real.T, atol=1e-10)


def test_wrong_conjugation_is_wrong():
    """The reference's hard-won lesson (fftisdf-supercell-2.py:188-201): using
    the conjugated phase in the RHS back-transform yields a DIFFERENT (wrong)
    object — it lands in the -q sector.  Needs an inversion-asymmetric cell
    (for symmetric ones the two coincide, which is exactly why the mistake is
    tempting)."""
    cell = Cell(
        a=np.diag([4.0, 4.5, 5.0]),
        atom=[("He", (1.1, 2.0, 1.3)), ("He", (2.9, 1.2, 3.9))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([9, 9, 11]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kmesh = [1, 1, 3]
    kpts = cell.get_kpts(kmesh)
    phase = kpt_mod.get_phase(cell, kpts, kmesh)
    coords = cell.gen_uniform_grids()
    ao = np.asarray(eval_ao_kpts(cell, coords, kpts))
    x_k = jnp.asarray(ao[:, ::97, :])
    f_k = jnp.asarray(ao[:, :300, :])
    y_good = np.asarray(_rhs_block(f_k, x_k, jnp.asarray(phase)))
    fx = np.einsum("kgm,kIm->kgI", np.asarray(f_k).conj(), np.asarray(x_k))
    fx_s = np.einsum("Rk,kgI->RgI", phase, fx)
    y_s = fx_s.real ** 2
    y_wrong = np.einsum("Rk,RgI->kgI", phase.conj(), y_s)
    # wrong variant = correct variant's -q sector; differs for q != -q
    assert abs(y_good - y_wrong).max() > 1e-3
    np.testing.assert_allclose(y_wrong[1], y_good[2], atol=1e-10)
