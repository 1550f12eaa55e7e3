"""Hydraulic solver tests against analytic solutions and conservation laws."""

import numpy as np
import pytest

from gnn_pressure_estimation_tpu.data.inp import parse_inp
from gnn_pressure_estimation_tpu.simgen.network_state import build_state
from gnn_pressure_estimation_tpu.simgen import solver_py
from gnn_pressure_estimation_tpu.simgen.solver_api import solve
from gnn_pressure_estimation_tpu.simgen import units as U


def hw_headloss_si(q_m3s, L_m, d_m, c):
    """Hazen-Williams headloss via EPANET's 4.727 ft/cfs constant."""
    q = q_m3s / U.CFS
    Lf = L_m / U.FT
    d = d_m / U.FT
    return 4.727 * Lf / c**1.852 / d**4.871 * abs(q) ** 1.852 * U.FT


SINGLE_PIPE = """
[JUNCTIONS]
 J1 50 10
[RESERVOIRS]
 R1 100
[PIPES]
 P1 R1 J1 1000 300 120 0 Open
[OPTIONS]
 UNITS LPS
 HEADLOSS H-W
[END]
"""


def test_single_pipe_analytic():
    """One reservoir, one junction, one pipe: head = H_res - h_loss(q=demand)."""
    wn = parse_inp(SINGLE_PIPE)
    ns = build_state(wn)
    res = solve(ns, backend="py")
    assert res.converged
    q = 0.010  # m^3/s
    expect_head = 100.0 - hw_headloss_si(q, 1000.0, 0.300, 120.0)
    np.testing.assert_allclose(res.head[0], expect_head, rtol=1e-4)
    np.testing.assert_allclose(res.pressure[0], expect_head - 50.0, rtol=1e-4)
    np.testing.assert_allclose(res.flow[0], 10.0, rtol=1e-4)  # LPS


SERIES = """
[JUNCTIONS]
 J1 10 5
 J2 10 5
[RESERVOIRS]
 R1 80
[PIPES]
 P1 R1 J1 500 250 110 0 Open
 P2 J1 J2 500 200 110 0 Open
[OPTIONS]
 UNITS LPS
 HEADLOSS H-W
[END]
"""


def test_series_pipes_mass_and_energy():
    wn = parse_inp(SERIES)
    ns = build_state(wn)
    res = solve(ns, backend="py")
    assert res.converged
    # mass balance: P1 carries 10 LPS, P2 carries 5 LPS
    np.testing.assert_allclose(res.flow, [10.0, 5.0], rtol=1e-4)
    # energy: head drops match HW formula
    h1 = 80.0 - hw_headloss_si(0.010, 500, 0.250, 110)
    h2 = h1 - hw_headloss_si(0.005, 500, 0.200, 110)
    np.testing.assert_allclose(res.head[:2], [h1, h2], rtol=1e-4)


PARALLEL = """
[JUNCTIONS]
 J1 0 20
[RESERVOIRS]
 R1 60
[PIPES]
 P1 R1 J1 800 250 100 0 Open
 P2 R1 J1 800 250 100 0 Open
[OPTIONS]
 UNITS LPS
 HEADLOSS H-W
[END]
"""


def test_parallel_pipes_split_evenly():
    wn = parse_inp(PARALLEL)
    ns = build_state(wn)
    res = solve(ns, backend="py")
    assert res.converged
    np.testing.assert_allclose(res.flow, [10.0, 10.0], rtol=1e-3)


PUMP_NET = """
[JUNCTIONS]
 J1 5 20
[RESERVOIRS]
 R1 10
[PUMPS]
 PU1 R1 J1 HEAD C1
[CURVES]
 C1 20 40
[OPTIONS]
 UNITS LPS
 HEADLOSS H-W
[END]
"""


def test_pump_head_curve():
    """Pump from reservoir straight into a demand junction: junction head =
    H_res + pump gain at q = demand; 1-pt curve → h = 4/3·40 − (40/3)(q/20)²."""
    wn = parse_inp(PUMP_NET)
    ns = build_state(wn)
    res = solve(ns, backend="py")
    assert res.converged
    q = 20.0  # LPS
    gain = 4.0 / 3.0 * 40.0 - (40.0 / 3.0) * (q / 20.0) ** 2
    np.testing.assert_allclose(res.head[0], 10.0 + gain, rtol=1e-3)
    np.testing.assert_allclose(res.flow[0], 20.0, rtol=1e-4)


CLOSED_PIPE = """
[JUNCTIONS]
 J1 0 5
 J2 0 5
[RESERVOIRS]
 R1 50
[PIPES]
 P1 R1 J1 100 200 100 0 Open
 P2 J1 J2 100 200 100 0 Closed
 P3 R1 J2 100 200 100 0 Open
[OPTIONS]
 UNITS LPS
[END]
"""


def test_closed_pipe_carries_no_flow():
    wn = parse_inp(CLOSED_PIPE)
    ns = build_state(wn)
    res = solve(ns, backend="py")
    assert res.converged
    assert abs(res.flow[1]) < 1e-4
    np.testing.assert_allclose(res.flow[0], 5.0, rtol=1e-3)
    np.testing.assert_allclose(res.flow[2], 5.0, rtol=1e-3)


PRV_NET = """
[JUNCTIONS]
 J1 0 0
 J2 0 10
[RESERVOIRS]
 R1 100
[PIPES]
 P1 R1 J1 200 300 130 0 Open
 P2 J2 J2X 1 300 130 0 Open
[VALVES]
 V1 J1 J2 300 PRV 30 0
[OPTIONS]
 UNITS LPS
[END]
"""


def test_prv_pins_downstream_pressure():
    # build a valid net: J2X placeholder removed; rebuild inline
    txt = """
[JUNCTIONS]
 J1 0 0
 J2 0 10
[RESERVOIRS]
 R1 100
[PIPES]
 P1 R1 J1 200 300 130 0 Open
[VALVES]
 V1 J1 J2 300 PRV 30 0
[OPTIONS]
 UNITS LPS
[END]
"""
    wn = parse_inp(txt)
    ns = build_state(wn)
    res = solve(ns, backend="py")
    assert res.converged
    # downstream junction pressure pinned at the 30 m setting
    np.testing.assert_allclose(res.pressure[1], 30.0, atol=0.05)
    np.testing.assert_allclose(res.flow[-1], 10.0, rtol=1e-3)


def test_demand_driven_balance_on_random_grid(rng):
    """Random loop network: junction mass balance holds at solution."""
    n = 5  # 5x5 grid
    lines = ["[JUNCTIONS]"]
    for i in range(n * n):
        lines.append(f" N{i} {rng.uniform(0, 20):.2f} {rng.uniform(0.5, 3):.3f}")
    lines.append("[RESERVOIRS]")
    lines.append(" R1 90")
    lines.append("[PIPES]")
    pid = 0
    def add_pipe(a, b):
        nonlocal pid
        lines.append(
            f" P{pid} {a} {b} {rng.uniform(80, 400):.1f} {rng.uniform(150, 350):.1f} "
            f"{rng.uniform(80, 140):.1f} 0 Open"
        )
        pid += 1
    for r in range(n):
        for c in range(n):
            i = r * n + c
            if c + 1 < n:
                add_pipe(f"N{i}", f"N{i+1}")
            if r + 1 < n:
                add_pipe(f"N{i}", f"N{i+n}")
    add_pipe("R1", "N0")
    lines += ["[OPTIONS]", " UNITS LPS", " HEADLOSS H-W", "[END]"]
    wn = parse_inp("\n".join(lines))
    ns = build_state(wn)
    res = solve(ns, backend="py")
    assert res.converged, f"iters={res.iterations}"
    # mass balance at each junction in cfs
    q = U.flow_to_cfs(res.flow, "LPS")
    bal = np.zeros(ns.n_nodes)
    np.add.at(bal, ns.node2, q)
    np.add.at(bal, ns.node1, -q)
    bal -= ns.demand
    assert np.abs(bal[: ns.n_junctions]).max() < 2e-4
    # headloss law on every open pipe
    head_ft = res.head / U.FT
    for li in range(len(ns.link_type) - 1):
        dh = head_ft[ns.node1[li]] - head_ft[ns.node2[li]]
        r = 4.727 * ns.length[li] / ns.roughness[li] ** 1.852 / ns.diameter[li] ** 4.871
        expect = r * abs(q[li]) ** 1.852 * np.sign(q[li])
        assert abs(dh - expect) < 5e-3, f"link {li}: {dh} vs {expect}"
