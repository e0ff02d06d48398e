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
