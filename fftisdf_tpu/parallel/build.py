"""Sharded ISDF build and J/K serving over a device mesh.

Sharding layout (original TPU design; the reference is single-process —
SURVEY.md section 2c):

  stage 1 (RHS sweep):   grid axis sharded over 'd' (shard_map: each device
                         streams ITS contiguous grid blocks through the same
                         lax.map pipeline the single-chip build uses)
  <reshard: one all-to-all over ICI>
  stage 2 (solve+FFT):   sector axis sharded, P('d', None, None) on y;
                         local sectors vmapped (dense eigh/FFT/matmul, no
                         communication inside the stage)
  serve (J/K):           k axis sharded through the same sector layout

Parity with the single-chip build (round-1 verdict item #4): the same
time-reversal sector halving (w_{-q} = conj(w_q); only canonical sectors run
the solve+FFT stage — and only their RHS crosses the all-to-all), the same
``refine`` accuracy knob threaded into the sector solve, and the same
HBM-budgeted sector chunking — when even the per-device share of the RHS
exceeds ``max_memory_gb``, canonical sectors are processed in chunks with
the grid sweep re-run per chunk (exactly the single-chip trade, scaled by
the device count).  This keeps f32 defaults and accuracy identical on both
paths and is the multi-chip replacement for the reference's HDF5 spill
(``/root/reference/fftisdf.py:60-64``).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.lax import with_sharding_constraint
from jax.sharding import NamedSharding, PartitionSpec as P

from fftisdf_tpu.basis.eval import make_evaluator
from fftisdf_tpu.lattice import kpoints as kpt_mod
from fftisdf_tpu.isdf.kpoint import (
    _stripe_quartic, _sector_wq, _eiqr_kernel, _take_rows, _take_cols,
    _scatter_trs, get_coulG_batched)
from fftisdf_tpu.isdf import jk as jk_mod
from fftisdf_tpu.parallel.mesh import grid_sharding, sector_sharding, replicated
from fftisdf_tpu.utils.device import to_device


def build_wq_sharded(cell, kpts, x_k, phase, dev_mesh, solver="lstsq",
                     rcond=1e-10, dtype=jnp.float64, refine=None,
                     use_trs=True, max_memory_gb=12.0, blksize=16384,
                     trunc=None, log=None):
    """Compute w_q over the device mesh.  Returns wq (nk, nip, nip), sector-
    sharded.  Uneven nk / device-count splits work via GSPMD padding."""
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    itemsize = 16 if dtype == jnp.float64 else 8
    ndev = int(np.prod([dev_mesh.shape[ax] for ax in dev_mesh.axis_names]))
    coords = cell.gen_uniform_grids()
    ngrid = coords.shape[0]
    fmesh = tuple(int(m) for m in cell.mesh)
    vol = float(cell.vol)
    nk, nip, _ = x_k.shape

    # Coulomb kernels / q-phases built on device from small inputs (mirrors
    # the single-chip build's tunnel-safety: no large host complex arrays)
    gv = jnp.asarray(cell.get_Gv(fmesh), dtype=dtype)
    kpts_d = jnp.asarray(np.asarray(kpts), dtype=dtype)
    coords_d = jnp.asarray(coords, dtype=dtype)
    coulG = get_coulG_batched(cell, kpts_d, gv, dtype=dtype, trunc=trunc)
    eiqr = _eiqr_kernel(coords_d, kpts_d).astype(cdtype)
    phase_dev = to_device(phase, dtype=cdtype)
    x4_k = _stripe_quartic(x_k, phase_dev)

    fn = make_evaluator(cell, kpts=kpts, dtype=dtype)

    # ---- time-reversal sector halving (same algebra as the single-chip
    # build, isdf.kpoint.FFTISDF.build): only canonical q <= mirror(q)
    # sectors run stage 1+2; mirrors are conjugate-scattered at the end
    s_kpts = cell.get_scaled_kpts(np.asarray(kpts))
    mirror = np.array([kpt_mod.member(-s_kpts[q], s_kpts, strict=False)
                       for q in range(nk)])
    if use_trs and not (mirror < 0).any():
        qsel = np.array([q for q in range(nk) if q <= mirror[q]])
    else:
        qsel = np.arange(nk)

    # ---- HBM budget -> canonical-sector chunking (per-DEVICE shares): a
    # chunk holds nq_c*ngrid*nip/ndev of y per device in both layouts, plus
    # the (nip, ngrid) G-space factor per in-flight local sector in stage 2
    per_sector_gb = ngrid * nip * itemsize / 1e9
    qchunk = len(qsel)
    if qchunk * per_sector_gb / ndev > max_memory_gb / 2:
        qchunk = max(1, int((max_memory_gb / 2) * ndev / per_sector_gb))
    if log is not None:
        log.info("build_sharded: nk=%d (canonical %d) nip=%d ngrid=%d "
                 "ndev=%d qchunk=%d (y/device %.2f GB/chunk)", nk,
                 len(qsel), nip, ngrid, ndev, qchunk,
                 min(qchunk, len(qsel)) * per_sector_gb / ndev)

    # ---- grid blocks: contiguous per-device segments, each streamed with
    # the same lax.map block pipeline as the single-chip build
    blk = min(int(blksize), -(-ngrid // ndev))
    nblk = -(-ngrid // blk)
    nblk = -(-nblk // ndev) * ndev          # divisible: even shard_map split
    pad = nblk * blk - ngrid
    coords_p = jnp.asarray(np.concatenate(
        [coords, np.zeros((pad, 3))], axis=0).reshape(nblk, blk, 3),
        dtype=dtype)

    gshard = grid_sharding(dev_mesh)
    sshard = sector_sharding(dev_mesh)

    def _rhs_local(coords_loc, x_k, phase_full, phase_cols):
        """Per-device RHS sweep over the local grid blocks (shard_map body;
        same algebra as isdf.kpoint._sweep_chunk's block_fn)."""
        nq = phase_cols.shape[1]

        def block_fn(c):
            f_k = fn(c)
            fx_k = jnp.einsum("kgm,kIm->kgI", f_k.conj(), x_k)
            fx_s = jnp.einsum("Rk,kgI->RgI", phase_full, fx_k)
            y_s = (fx_s.real ** 2).astype(fx_s.dtype)
            return jnp.einsum("Rq,RgI->qgI", phase_cols, y_s)

        y_blocks = jax.lax.map(block_fn, coords_loc)   # (nblk_loc, nq, blk, nip)
        return jnp.transpose(y_blocks, (1, 0, 2, 3)).reshape(nq, -1, nip)

    rhs_sharded = jax.shard_map(
        _rhs_local, mesh=dev_mesh,
        in_specs=(P("d", None, None), P(), P(), P()),
        out_specs=P(None, "d", None))

    @partial(jax.jit, static_argnames=("nq",))
    def step(coords_p, x_k, phase_full, phase_cols, x4_c, coulG_c, eiqr_c,
             *, nq):
        # stage 1: grid-sharded RHS for this chunk's canonical sectors only
        y = rhs_sharded(coords_p, x_k, phase_full, phase_cols)[:, :ngrid, :]
        y = with_sharding_constraint(y, gshard)
        # reshard: ONE all-to-all over ICI into the sector layout
        y = with_sharding_constraint(y, sshard)
        # stage 2: per-sector solve + FFT Coulomb, vmapped over local sectors
        # signed metric iff a truncated kernel can carry negative samples
        # (isdf.kpoint._sector_wq docstring)
        wq_c = jax.vmap(
            lambda x4_q, y_q, cg, ph: _sector_wq(
                x4_q, y_q, cg, ph, fmesh, vol, ngrid, solver=solver,
                rcond=rcond, refine=refine, signed=trunc is not None)[0]
        )(x4_c, y, coulG_c, eiqr_c)
        return with_sharding_constraint(wq_c, sshard)

    wq_parts = []
    for q0 in range(0, len(qsel), qchunk):
        qs = jnp.asarray(qsel[q0:q0 + qchunk])
        wq_parts.append(step(
            coords_p, x_k, phase_dev, _take_cols(phase_dev, qs),
            _take_rows(x4_k, qs), _take_rows(coulG, qs),
            _take_rows(eiqr, qs), nq=len(qs)))
    wq_sel = (jnp.concatenate(wq_parts, axis=0) if len(wq_parts) > 1
              else wq_parts[0])

    if len(qsel) < nk:
        pos_of = {int(q): i for i, q in enumerate(qsel)}
        order = np.empty(nk, dtype=np.int64)
        conj_flag = np.zeros(nk, dtype=bool)
        for q in range(nk):
            if q in pos_of:
                order[q] = pos_of[q]
            else:
                order[q] = pos_of[int(mirror[q])]
                conj_flag[q] = True
        scatter = jax.jit(
            lambda w, o, c: with_sharding_constraint(
                _scatter_trs(w, o, c), sshard))
        return scatter(wq_sel, jnp.asarray(order), jnp.asarray(conj_flag))
    return jax.jit(lambda w: with_sharding_constraint(w, sshard))(wq_sel)


def build_sharded(df, dev_mesh):
    """Sharded analog of FFTISDF.build(): same selection, sharded state
    build, SAME accuracy knobs (solver/rcond/refine/use_trs resolved by the
    FFTISDF object, so dtype-aware defaults are identical on both paths)."""
    from fftisdf_tpu.isdf.kpoint import select_interpolation_points

    x_k, mask, rank = select_interpolation_points(
        df.cell, df.kpts, df.m0, df.c0, dtype=df.dtype,
        select_tol=df.select_tol, log=df._log,
        host_f64=df.select_host_f64)
    df.mask = mask
    phase = df.phase
    df.x_k = jax.device_put(x_k, replicated(dev_mesh))
    df.wq = build_wq_sharded(df.cell, df.kpts, df.x_k, phase, dev_mesh,
                             solver=df.solver, rcond=df.rcond,
                             dtype=df.dtype, refine=df.refine,
                             use_trs=df.use_trs,
                             max_memory_gb=df.max_memory_gb,
                             blksize=df.blksize, trunc=df.trunc,
                             log=df._log)
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
