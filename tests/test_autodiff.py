"""Differentiable-ISDF gates: autodiff vs finite differences.

Gradients of the compressed-ERI approximant w.r.t. nuclear positions (frozen
interpolation-point set) — a capability the reference's numpy/LAPACK stack
cannot provide.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fftisdf_tpu.lattice.cell import Cell, Shell
from fftisdf_tpu.isdf import FFTISDF
from fftisdf_tpu.isdf.autodiff import isdf_state_fn, eri_grad_fn
from fftisdf_tpu.lattice import kpoints as kpt_mod


@pytest.fixture(scope="module")
def setup():
    cell = Cell(
        a=np.diag([5.0, 5.0, 6.0]),
        atom=[("He", (2.5, 2.4, 2.0)), ("He", (2.5, 2.6, 4.1))],
        basis={"He": [Shell(l=0, exps=np.array([1.0, 0.35]),
                            coeffs=np.eye(2))]},
        pseudo=None,
        mesh=np.array([9, 9, 11]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts([1, 1, 2])
    df = FFTISDF(cell, kpts, c0=12.0, m0=(7, 7, 9), verbose=0).build()
    return cell, kpts, df


def test_state_fn_matches_build(setup):
    cell, kpts, df = setup
    state = isdf_state_fn(cell, kpts, df.mask, m0=df.m0)
    pos = np.asarray([x for _, x in cell.atom])
    x_k, wq = state(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(df.x_k),
                               atol=1e-10)
    # w_q carries near-null-space components that depend on solve details;
    # compare at a relative tolerance of the metric's scale
    scale = float(np.abs(np.asarray(df.wq)).max())
    np.testing.assert_allclose(np.asarray(wq), np.asarray(df.wq),
                               atol=5e-6 * scale)


def test_eri_gradient_vs_finite_difference(setup):
    cell, kpts, df = setup
    k2c = kpt_mod.get_kconserv2(cell, kpts)
    nao = df.x_k.shape[2]
    rng = np.random.default_rng(0)
    probe = jnp.asarray(rng.standard_normal((nao,) * 4)
                        + 1j * rng.standard_normal((nao,) * 4))
    vg = eri_grad_fn(cell, kpts, df.mask, (0, 1, 1, 0), k2c, m0=df.m0)
    pos0 = np.asarray([x for _, x in cell.atom])
    val0, grad = vg(jnp.asarray(pos0), probe)
    grad = np.asarray(grad)

    # central finite differences on two representative components
    h = 1e-5
    for (ia, d) in [(0, 2), (1, 1)]:
        pp = pos0.copy(); pp[ia, d] += h
        pm = pos0.copy(); pm[ia, d] -= h
        vp, _ = vg(jnp.asarray(pp), probe)
        vm, _ = vg(jnp.asarray(pm), probe)
        fd = (float(vp) - float(vm)) / (2 * h)
        np.testing.assert_allclose(grad[ia, d], fd, rtol=2e-5, atol=1e-8)
    # gradient should be nontrivial
    assert np.abs(grad).max() > 1e-4


def test_trs_halving_state_and_gradient():
    """TRS canonical-sector halving (w_{-q} = conj(w_q)) must reproduce the
    full-sector state AND its gradient — 1x1x3 has a genuine mirror pair
    (q=1 <-> q=2), unlike the 1x1x2 fixture where every sector is
    self-conjugate."""
    cell = Cell(
        a=np.diag([5.0, 5.0, 6.0]),
        atom=[("He", (2.5, 2.4, 2.0)), ("He", (2.5, 2.6, 4.1))],
        basis={"He": [Shell(l=0, exps=np.array([1.0, 0.35]),
                            coeffs=np.eye(2))]},
        pseudo=None,
        mesh=np.array([9, 9, 11]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts([1, 1, 3])
    df = FFTISDF(cell, kpts, c0=12.0, m0=(7, 7, 9), verbose=0).build()
    pos0 = jnp.asarray([x for _, x in cell.atom])
    nao = df.x_k.shape[2]
    rng = np.random.default_rng(3)
    probe = jnp.asarray(rng.standard_normal((nao,) * 4)
                        + 1j * rng.standard_normal((nao,) * 4))
    k2c = kpt_mod.get_kconserv2(cell, kpts)

    def val_grad(use_trs):
        state = isdf_state_fn(cell, kpts, df.mask, m0=df.m0,
                              use_trs=use_trs)

        def scalar(positions, probe):
            x_k, wq = state(positions)
            from fftisdf_tpu.isdf.eri import assemble_eri
            eri = assemble_eri(wq[int(k2c[0, 2])], x_k[0], x_k[2],
                               x_k[1], x_k[0])
            return jnp.real(jnp.sum(probe * eri))

        return jax.value_and_grad(scalar)(pos0, probe)

    v_full, g_full = val_grad(False)
    v_trs, g_trs = val_grad(True)
    # the identity w_{-q} = conj(w_q) is exact; the COMPUTED sectors differ
    # in near-null fit directions by eps/rcond noise (same reason the
    # build's TRS test compares physical outputs, not raw w_q) — a wiring
    # bug would be O(1)
    np.testing.assert_allclose(float(v_trs), float(v_full), rtol=5e-6)
    scale = max(1.0, float(np.abs(np.asarray(g_full)).max()))
    np.testing.assert_allclose(np.asarray(g_trs), np.asarray(g_full),
                               atol=1e-5 * scale)


def test_sector_chunked_state_and_gradient():
    """max_memory_gb-driven sector chunking (the differentiable analog of
    the build's qchunk — round-2 item #5): a budget forcing multi-chunk
    sweeps must reproduce the single-shot state AND its gradient.  Uses a
    1x1x3 mesh so TRS (2 canonical sectors) composes with chunking
    (qchunk=1)."""
    cell = Cell(
        a=np.diag([5.0, 5.0, 6.0]),
        atom=[("He", (2.5, 2.4, 2.0)), ("He", (2.5, 2.6, 4.1))],
        basis={"He": [Shell(l=0, exps=np.array([1.0, 0.35]),
                            coeffs=np.eye(2))]},
        pseudo=None,
        mesh=np.array([9, 9, 11]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts([1, 1, 3])
    df = FFTISDF(cell, kpts, c0=12.0, m0=(7, 7, 9), verbose=0).build()
    pos0 = jnp.asarray([x for _, x in cell.atom])
    nao = df.x_k.shape[2]
    rng = np.random.default_rng(3)
    probe = jnp.asarray(rng.standard_normal((nao,) * 4))
    k2c = kpt_mod.get_kconserv2(cell, kpts)

    def vag_with(**kw):
        # rcond=1e-8: chunked and single-shot sweeps differ by eps/rcond-
        # amplified solve noise (different contraction orders; measured to
        # scale exactly with 1/rcond, so this is noise, not a math bug)
        state = isdf_state_fn(cell, kpts, df.mask, m0=df.m0, rcond=1e-8,
                              **kw)

        def scalar(positions, probe):
            x_k, wq = state(positions)
            q = int(k2c[0, 1])
            eri = jnp.einsum("IJ,Im,In,Jk,Jl->mnkl", wq[q],
                             x_k[0].conj(), x_k[1], x_k[1].conj(), x_k[0])
            return jnp.real(jnp.sum(probe * eri))

        return jax.jit(jax.value_and_grad(scalar))(pos0, probe)

    v_ref, g_ref = vag_with()
    # one canonical sector per chunk: ngrid*nip*16 bytes/sector, budget
    # ~2 sectors total -> qchunk = 1 of the 2 canonical sectors
    nip = df.x_k.shape[1]
    per_sector_gb = 9 * 9 * 11 * nip * 16 / 1e9
    v_c, g_c = vag_with(max_memory_gb=2 * per_sector_gb)
    np.testing.assert_allclose(float(v_c), float(v_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_ref),
                               atol=2e-6 * max(1.0,
                                               float(np.abs(g_ref).max())))
    # large budget: one chunk; same noise bound (the chunked path always
    # recomputes its RHS with the column-restricted contraction)
    v_1, g_1 = vag_with(max_memory_gb=1e3)
    np.testing.assert_allclose(float(v_1), float(v_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_1), np.asarray(g_ref),
                               atol=2e-6 * max(1.0,
                                               float(np.abs(g_ref).max())))
