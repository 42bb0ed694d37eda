"""Native (C++) builder vs numpy fallback equivalence."""
import numpy as np
import pytest

from dmft_lanc_ed_tpu import native
from dmft_lanc_ed_tpu.sectors import enumerate_states, hop_entries


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_enumerate_states_native(lib):
    for ns, npart in [(4, 2), (10, 5), (12, 3), (6, 0), (6, 6)]:
        got = native.enumerate_states(ns, npart)
        expect = __import__("dmft_lanc_ed_tpu.sectors", fromlist=["x"]).enumerate_states_np(ns, npart)
        np.testing.assert_array_equal(got, expect)


def test_hop_entries_native(lib):
    states = enumerate_states(8, 4)
    pos_c = np.array([0, 3, 5, 1], np.int32)
    pos_d = np.array([2, 0, 5, 6], np.int32)
    amps = np.array([0.7, -1.3, 0.4, 2.0])
    rows, cols, vals = native.hop_entries_batch(states, pos_c, pos_d, amps)
    # numpy reference, term by term
    er, ec, ev = [], [], []
    for c, d, a in zip(pos_c, pos_d, amps):
        r_, c_, v_ = hop_entries(states, int(c), int(d), float(a))
        er.append(r_)
        ec.append(c_)
        ev.append(v_)
    er = np.concatenate(er)
    ec = np.concatenate(ec)
    ev = np.concatenate(ev)
    # same multiset of entries
    key = lambda r, c: r * 10**6 + c
    got = sorted(zip(key(rows, cols), vals))
    exp = sorted(zip(key(er, ec), ev))
    assert len(got) == len(exp)
    for (kg, vg), (ke, ve) in zip(got, exp):
        assert kg == ke and abs(vg - ve) < 1e-14


def test_encode_runs_native(lib):
    rows = np.array([0, 1, 2, 5, 6, 9], np.int64)
    cols = np.array([3, 4, 5, 1, 2, 7], np.int64)
    vals = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 1.0])
    d0, s0, ln, vv = native.encode_runs(rows, cols, vals)
    assert list(ln) == [3, 2, 1]
    assert list(d0) == [0, 5, 9]
    assert list(s0) == [3, 1, 7]
    assert list(vv) == [1.0, 2.0, 1.0]
