"""Pallas TPU kernel: fused squared pair-density gram.

The interpolation-point selection (ref ``/root/reference/fftisdf.py:376-379``)
needs

    x4[g,h] = ( |sum_k X_k X_k^H|^2 [g,h] )^alpha / nk,   alpha = 1 (gram) or
                                                          2 (selection metric)

XLA evaluates this as a complex matmul materializing the (ng, ng) complex
gram (16 B/element), then two elementwise passes.  This kernel fuses the
|.|^2 (and the optional extra square) into the matmul epilogue: the complex
contraction runs as four real MXU matmuls on VMEM tiles and only the final
real (ng, ng) tile (4 B/element) ever reaches HBM — a 4x cut in HBM traffic
for the selection metric.

Inputs are the real/imag parts with the (k, nao) axes flattened:
xr, xi: (ng, K) with K = nk*nao, zero-padded to lane multiples by the caller
wrapper.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic specific; keep imports lazy-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _gram_kernel(xr_ref, xi_ref, yr_ref, yi_ref, out_ref, acc_r, acc_i, *,
                 square: bool, inv_nk: float):
    """out = ((xr yr^T + xi yi^T)^2 + (xi yr^T - xr yi^T)^2)^(1 or 2) / nk^..

    The contraction (K) axis is the innermost grid dimension: partial sums
    accumulate in VMEM scratch, the modulus epilogue fires on the last step.
    """
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_r[:] = jnp.zeros_like(acc_r)
        acc_i[:] = jnp.zeros_like(acc_i)

    xr = xr_ref[:]
    xi = xi_ref[:]
    yr = yr_ref[:]
    yi = yi_ref[:]
    # pin the dot precision: Mosaic lowers only HIGHEST/DEFAULT, so the
    # kernel must not inherit a global 'high' default; selection accuracy
    # wants the full 6-pass f32 path here regardless
    dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    acc_r[:] += dot(xr, yr.T) + dot(xi, yi.T)
    acc_i[:] += dot(xi, yr.T) - dot(xr, yi.T)

    @pl.when(kb == nkb - 1)
    def _():
        g_r = acc_r[:]
        g_i = acc_i[:]
        out = (g_r * g_r + g_i * g_i) * (inv_nk * inv_nk)
        if square:
            out = out * out
        out_ref[:] = out


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("square", "tile", "interpret"))
def pair_gram_sq(x_kpts, square=True, tile=256, interpret=False):
    """x4[g,h] = (|sum_k conj(X_k) X_k^T|^2 / nk^2)^(2 if square else 1).

    x_kpts: (nk, ng, nao) complex (or (ng, nao) promoted).  Matches
    ``(x2 * x2 / nk)``-style selection metrics (ref fftisdf.py:376-379,
    where x2 already carries the k sum) up to the documented normalization:
    here the gram includes 1/nk so the result is (x2/nk)^2-consistent with
    isdf.gamma.pair_gram.
    """
    if x_kpts.ndim == 2:
        x_kpts = x_kpts[None]
    nk, ng, nao = x_kpts.shape
    kk = nk * nao
    # flatten (k, nao) into the contraction axis; real/imag split
    xt = jnp.transpose(x_kpts, (1, 0, 2)).reshape(ng, kk)
    xr = jnp.real(xt).astype(jnp.float32)
    xi = jnp.imag(xt).astype(jnp.float32)

    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")

    tile = min(tile, _round_up(ng, 8))
    ngp = _round_up(ng, tile)
    ktile = 512  # contraction block: bounds VMEM to ~4 x tile x ktile floats
    kkp = _round_up(kk, min(ktile, _round_up(kk, 128)))
    kkp = _round_up(kkp, 128)
    xr = jnp.pad(xr, ((0, ngp - ng), (0, kkp - kk)))
    xi = jnp.pad(xi, ((0, ngp - ng), (0, kkp - kk)))
    kt = min(ktile, kkp)

    grid = (ngp // tile, ngp // tile, kkp // kt)
    kernel = partial(_gram_kernel, square=square, inv_nk=1.0 / nk)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ngp, ngp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, kt), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((tile, kt), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((tile, kt), lambda i, j, kb: (j, kb)),
            pl.BlockSpec((tile, kt), lambda i, j, kb: (j, kb)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j, kb: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((tile, tile), jnp.float32),
            pltpu.VMEM((tile, tile), jnp.float32),
        ],
        interpret=interpret,
    )(xr, xi, xr, xi)
    return out[:ng, :ng]


def pair_gram_sq_reference(x_kpts, square=True):
    """einsum reference implementation (used on CPU and in tests)."""
    if x_kpts.ndim == 2:
        x_kpts = x_kpts[None]
    nk = x_kpts.shape[0]
    g = jnp.einsum("kgm,khm->gh", x_kpts.conj(), x_kpts) / nk
    out = jnp.abs(g) ** 2
    if square:
        out = out * out
    return out.astype(jnp.float32 if x_kpts.dtype == jnp.complex64
                      else jnp.float64)
