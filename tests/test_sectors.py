"""Unit tests: sector enumeration, fermionic algebra, operator maps."""
import numpy as np
import pytest

from dmft_lanc_ed_tpu.config import EDConfig
from dmft_lanc_ed_tpu.sectors import (
    SectorTable, enumerate_states, jw_sign, occupations, op_map,
    hop_entries, bath_stride, qn, twin_sector_order,
)
from fock_oracle import jw_ops

from math import comb


def test_enumerate_states_counts_and_order():
    for n in range(1, 8):
        for k in range(n + 1):
            st = enumerate_states(n, k)
            assert len(st) == comb(n, k)
            assert np.all(np.diff(st) > 0)
            assert all(bin(int(s)).count("1") == k for s in st)


def test_jw_sign_matches_definition():
    states = enumerate_states(6, 3)
    for pos in range(6):
        sg = jw_sign(states, pos)
        expect = [(-1) ** bin(int(s) & ((1 << pos) - 1)).count("1") for s in states]
        assert np.array_equal(sg, expect)


def test_occupations():
    st = np.array([0b1011])
    occ = occupations(st, 4)
    assert occ.tolist() == [[1, 1, 0, 1]]


def test_op_map_against_dense_jw():
    """c / cdg maps agree with dense JW operator matrices."""
    n = 4
    cs = jw_ops(n)
    for npart in range(n):
        src = enumerate_states(n, npart)
        dst_c = enumerate_states(n, npart - 1) if npart > 0 else None
        dst_d = enumerate_states(n, npart + 1)
        for p in range(n):
            # cdg
            idx, sgn = op_map(src, dst_d, p, create=True)
            cdg = cs[p].T
            for j, (i, s) in enumerate(zip(idx, sgn)):
                col = cdg[:, src[j]]
                if i < 0:
                    assert not col.any()
                else:
                    assert col[dst_d[i]] == s and np.count_nonzero(col) == 1
            # c
            if dst_c is not None:
                idx, sgn = op_map(src, dst_c, p, create=False)
                for j, (i, s) in enumerate(zip(idx, sgn)):
                    col = cs[p][:, src[j]]
                    if i < 0:
                        assert not col.any()
                    else:
                        assert col[dst_c[i]] == s and np.count_nonzero(col) == 1


def test_hop_entries_vs_dense():
    n = 5
    cs = jw_ops(n)
    states = enumerate_states(n, 2)
    for a in range(n):
        for b in range(n):
            rows, cols, vals = hop_entries(states, a, b, 1.7)
            dense = 1.7 * (cs[a].T @ cs[b])
            block = dense[np.ix_(states, states)]
            rebuilt = np.zeros_like(block)
            rebuilt[rows, cols] = vals
            assert np.allclose(rebuilt, block)


def test_sector_table_dims_and_ladders():
    cfg = EDConfig(norb=1, nbath=3)   # ns = 4
    tab = SectorTable(cfg)
    qns = tab.all_qns()
    assert len(qns) == cfg.nsectors == 25
    total = sum(tab.dim(s) for s in qns)
    assert total == 4 ** cfg.ns      # sum over sectors = full Fock space
    s = qn(2, 1)
    assert tab.dim(s) == comb(4, 2) * comb(4, 1)
    assert tab.c_sector(s, 0, 0) == qn(1, 1)
    assert tab.cdg_sector(s, 0, 1) == qn(2, 2)
    assert tab.c_sector(qn(0, 1), 0, 0) is None
    assert tab.cdg_sector(qn(4, 1), 0, 0) is None
    assert tab.twin(s) == qn(1, 2)


def test_bath_stride_normal_hybrid_replica():
    cfg = EDConfig(norb=2, nbath=2, bath_type="normal", uloc=(2.0, 2.0))
    # normal: Norb + iorb*Nbath + k
    assert bath_stride(cfg, 0, 0) == 2 and bath_stride(cfg, 1, 1) == 5
    cfg = EDConfig(norb=2, nbath=3, bath_type="hybrid", uloc=(2.0, 2.0))
    assert bath_stride(cfg, 0, 2) == 4 == bath_stride(cfg, 1, 2)
    cfg = EDConfig(norb=2, nbath=2, bath_type="replica", uloc=(2.0, 2.0))
    assert bath_stride(cfg, 0, 0) == 2 and bath_stride(cfg, 1, 0) == 3
    assert bath_stride(cfg, 0, 1) == 4


def test_twin_sector_order_is_permutation():
    cfg = EDConfig(norb=1, nbath=3)
    tab = SectorTable(cfg)
    sec = tab.sector(qn(2, 1))
    order = twin_sector_order(sec)
    assert sorted(order.tolist()) == list(range(sec.dim))
