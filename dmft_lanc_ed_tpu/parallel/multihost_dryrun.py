"""2-process CPU dryrun of the multi-host lattice path.

Each process: force the CPU backend, join the multi-controller runtime,
solve its round-robin subset of a 3-site inequivalent-site problem, and
AllReduce-merge the per-site arrays (the ed_solve_lattice_mpi protocol,
ED_MAIN.f90:603-672). Process 0 writes the merged arrays to --out; the
launcher (tests/test_multihost.py or __graft_entry__.dryrun_multihost)
compares them against a serial solve.

Run as:  python -m dmft_lanc_ed_tpu.parallel.multihost_dryrun \
            --coord localhost:PORT --nproc 2 --pid I --out OUT.npz
"""
from __future__ import annotations

import argparse

import numpy as np


def lattice_problem():
    """A small 3-site problem with per-site Uloc overrides (uneven split:
    3 sites over 2 processes exercises the zero-fill merge)."""
    from ..config import EDConfig
    cfg = EDConfig(norb=1, nbath=2, uloc=(2.0,), lmats=16, lreal=8,
                   lanc_dim_threshold=64)
    nlat = 3
    hloc = np.zeros((nlat, 1, 1, 1, 1))
    hloc[1, 0, 0, 0, 0] = 0.15
    uloc_ii = np.array([[2.0], [1.5], [2.5]])
    return cfg, nlat, hloc, uloc_ii


def solve_merged():
    from ..lattice import LatticeSolver
    cfg, nlat, hloc, uloc_ii = lattice_problem()
    bank = LatticeSolver(cfg, nlat, hloc=hloc, uloc_ii=uloc_ii)
    baths = bank.init_baths()
    arrays = bank.solve_multihost(baths)
    fitted = bank.fit_baths_multihost(arrays.g_mats, baths)
    return arrays, fitted


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coord", required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    from .multihost import init_multihost
    init_multihost(a.coord, a.nproc, a.pid, platform="cpu")
    arrays, fitted = solve_merged()
    if a.pid == 0:
        np.savez(a.out, sigma_mats=arrays.sigma_mats, g_mats=arrays.g_mats,
                 dens=arrays.dens, docc=arrays.docc, egs=arrays.egs,
                 fitted=fitted)
    else:
        # every process must hold the identical merged arrays
        np.savez(a.out, dens=arrays.dens, egs=arrays.egs, fitted=fitted)


if __name__ == "__main__":
    main()
