"""LS-THC demo: fit THC factors against Cholesky ERIs and print the
per-k-pair error report (native analog of the reference driver
``k_least_square.py:274-299``).

Usage: python examples/thc_demo.py [--becke] [--kmesh 1 1 2]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--becke", action="store_true",
                   help="fit on atom-centered Becke grids instead of the "
                        "uniform FFT grid")
    p.add_argument("--kmesh", type=int, nargs=3, default=[1, 1, 2])
    p.add_argument("--row-only", action="store_true",
                   help="reference mode: fit on the k1=0 pair row only")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from fftisdf_tpu.lattice.cell import Cell
    from fftisdf_tpu.isdf.thc import LSTHC

    cell = Cell(
        a=np.diag([5.0, 5.0, 7.0]),
        atom=[("He", (2.5, 2.5, 2.0)), ("He", (2.5, 2.5, 4.5))],
        basis="sto-3g",
        pseudo=None,
        mesh=np.array([9, 9, 11]),
        unit="bohr",
        precision=1e-12,
    ).build()
    kpts = cell.get_kpts(args.kmesh)

    grids = None
    if args.becke:
        from fftisdf_tpu.lattice.becke import AtomCenteredGrids

        grids = AtomCenteredGrids(cell, level=0).build()
        print(f"Becke grid: {len(grids.weights)} points")

    thc = LSTHC(cell, kpts, verbose=3, grids=grids)
    thc.build(row_only=args.row_only)
    print(f"nip = {len(thc.mask)}")
    thc.error_report()


if __name__ == "__main__":
    main()
