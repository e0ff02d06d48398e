"""Sharded ISDF build and J/K serving over a device mesh.

Sharding layout (original TPU design; the reference is single-process —
SURVEY.md section 2c):

  stage 1 (RHS sweep):   grid axis sharded,   P(None, 'd', None) on y
  <reshard: one all-to-all over ICI>
  stage 2 (solve+FFT):   sector axis sharded, P('d', None, None) on y
  serve (J/K):           k axis sharded through the same sector layout

Everything is expressed with ``jax.jit`` + ``with_sharding_constraint``
(GSPMD): XLA inserts the collectives.  The per-sector solve + 3D FFT are
vmapped over the local sectors, so each device runs dense eigh/FFT/matmul on
its own q's with no communication inside stage 2.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.lax import with_sharding_constraint

from fftisdf_tpu.basis.eval import make_evaluator
from fftisdf_tpu.isdf.kpoint import _stripe_quartic, _rhs_block, _sector_wq
from fftisdf_tpu.linalg.coulomb import get_coulG
from fftisdf_tpu.isdf import jk as jk_mod
from fftisdf_tpu.parallel.mesh import grid_sharding, sector_sharding, replicated
from fftisdf_tpu.utils.device import to_device


def _sector_solve(x4_q, y_q, coulG_q, eiqr_q, mesh, vol, ngrid, solver, rcond):
    return _sector_wq(x4_q, y_q, coulG_q, eiqr_q, mesh, vol, ngrid,
                      solver=solver, rcond=rcond)[0]


def build_wq_sharded(cell, kpts, x_k, phase, dev_mesh, solver="lstsq",
                     rcond=1e-10, dtype=jnp.float64):
    """Compute w_q over the device mesh.  Returns wq (nk, nip, nip), sector-
    sharded.  nk must be divisible by the mesh size for an even layout
    (smaller meshes still work via GSPMD padding)."""
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    coords = cell.gen_uniform_grids()
    ngrid = coords.shape[0]
    fmesh = tuple(int(m) for m in cell.mesh)
    vol = float(cell.vol)
    gv = cell.get_Gv(fmesh)
    coulG = np.stack([np.asarray(get_coulG(cell, q=q, gv=gv)) for q in kpts])
    eiqr = np.exp(1j * coords @ np.asarray(kpts).T).T

    fn = make_evaluator(cell, kpts=kpts, dtype=dtype)

    gshard = grid_sharding(dev_mesh)
    sshard = sector_sharding(dev_mesh)

    @jax.jit
    def step(coords, x_k, phase, coulG, eiqr):
        # stage 1: grid-sharded RHS
        coords = with_sharding_constraint(
            coords, jax.sharding.NamedSharding(dev_mesh,
                                               jax.sharding.PartitionSpec("d", None)))
        f_k = fn(coords)
        x4_k = _stripe_quartic(x_k, phase)
        y = _rhs_block(f_k, x_k, phase)
        y = with_sharding_constraint(y, gshard)
        # reshard: all-to-all into sector layout
        y = with_sharding_constraint(y, sshard)
        # stage 2: per-sector solve + FFT Coulomb, vmapped over local sectors
        wq = jax.vmap(
            lambda x4_q, y_q, cg, ph: _sector_solve(
                x4_q, y_q, cg, ph, fmesh, vol, ngrid, solver, rcond)
        )(x4_k, y, coulG, eiqr)
        return with_sharding_constraint(wq, sshard)

    return step(
        jnp.asarray(coords, dtype=dtype),
        x_k,
        to_device(phase, dtype=cdtype),
        jnp.asarray(coulG, dtype=dtype),
        to_device(eiqr, dtype=cdtype),
    )


def build_sharded(df, dev_mesh):
    """Sharded analog of FFTISDF.build(): same selection, sharded state build."""
    from fftisdf_tpu.isdf.kpoint import select_interpolation_points

    x_k, mask, rank = select_interpolation_points(
        df.cell, df.kpts, df.m0, df.c0, dtype=df.dtype,
        select_tol=df.select_tol, log=df._log,
        host_f64=df.select_host_f64)
    df.mask = mask
    phase = df.phase
    df.x_k = jax.device_put(x_k, replicated(dev_mesh))
    df.wq = build_wq_sharded(df.cell, df.kpts, df.x_k, phase, dev_mesh,
                             solver=df.solver, rcond=df.rcond, dtype=df.dtype)
    return df


def get_jk_sharded(df, dm_kpts, dev_mesh):
    """J/K with the sector axis sharded over the mesh (serving path)."""
    sshard = sector_sharding(dev_mesh)
    cdtype = df.wq.dtype
    phase = to_device(df.phase, dtype=cdtype)

    @jax.jit
    def step(x_k, wq, ph, dm):
        x_k = with_sharding_constraint(x_k, sshard)
        wq = with_sharding_constraint(wq, sshard)
        vj = jk_mod.get_j_kpts(x_k, wq[0], dm[None])[0]
        vk = jk_mod.get_k_kpts(x_k, wq, ph, dm[None])[0]
        return vj, vk

    return step(df.x_k, df.wq, phase, to_device(dm_kpts, dtype=df.wq.dtype))
