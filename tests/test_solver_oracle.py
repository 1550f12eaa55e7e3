"""Oracle diversity for the hydraulic solvers (VERDICT r2 missing #4).

Both in-repo engines are GGA implementations, so this file checks them
against things that share *no* algorithm with GGA:

1. **Analytic fixtures** — networks whose exact solution is hand-derived in
   the test from the published formulas (EPANET 2.2 manual: Hazen-Williams
   h = 4.727 C^-1.852 d^-4.871 L q^1.852 in ft/cfs; 1-point pump-curve rule
   h0 = 4/3 h1, qmax = 2 q1; unit constants 1 ft = 0.3048 m,
   1 cfs = 448.831 gpm, 1 psi = 1/0.4333 ft). These validate the full
   INP → unit conversion → solve → reporting pipeline end to end against
   numbers produced *outside* either implementation.
2. **First-principles certificates** (`simgen/solver_certify.py`) — mass
   balance, energy equations, and valve control constraints evaluated
   directly on the solution; no GGA machinery involved.
3. **An independent engine** (`simgen/solver_root.py`) — scipy.optimize
   dense Newton on the full nonlinear system (different algorithm class);
   given the statuses a GGA solver decided, it must reproduce the same
   continuous solution.

Reference semantics source: generator/EPYNET/Executorv7.py:325-424.
"""

import math

import numpy as np
import pytest

from gnn_pressure_estimation_tpu.data.inp import parse_inp
from gnn_pressure_estimation_tpu.simgen import solver_certify, solver_py, solver_root
from gnn_pressure_estimation_tpu.simgen.network_state import ACTIVE, build_state
from gnn_pressure_estimation_tpu.simgen.solver_api import solve as api_solve
from gnn_pressure_estimation_tpu.simgen import solver_cpp

from test_solver_cpp import _bridge_net, _valve_net, make_random_net

# published unit constants (not imported from the package on purpose)
FT_PER_M = 1.0 / 0.3048
CFS_PER_GPM = 1.0 / 448.831
CFS_PER_LPS = 0.035314666721489
PSI_PER_FT = 0.4333


def _tight(ns, accuracy=1e-9, trials=400):
    ns.accuracy = accuracy
    ns.trials = trials
    return ns


def _hw_headloss_ft(L_ft, d_ft, C, q_cfs):
    """Hazen-Williams headloss, published US-unit formula."""
    return 4.727 * L_ft / (C**1.852 * d_ft**4.871) * q_cfs**1.852


# ---------------------------------------------------------------------------
# 1. analytic fixtures
# ---------------------------------------------------------------------------


def test_single_pipe_gpm_matches_published_formula():
    """R1(100 ft) --1000ft/12in/C100 pipe-- N1(demand 500 gpm)."""
    txt = """
[JUNCTIONS]
 N1 0 500
[RESERVOIRS]
 R1 100
[PIPES]
 P1 R1 N1 1000 12 100 0 Open
[OPTIONS]
 UNITS GPM
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""
    ns = _tight(build_state(parse_inp(txt)))
    res = api_solve(ns, backend="py")
    # hand derivation: flow through the single pipe equals the demand
    q_cfs = 500.0 * CFS_PER_GPM
    h = _hw_headloss_ft(1000.0, 1.0, 100.0, q_cfs)
    expect_head_ft = 100.0 - h
    # GPM is a US unit system: head reported in ft, pressure in psi
    n1 = ns.node_names.index("N1")
    assert res.head[n1] == pytest.approx(expect_head_ft, abs=2e-4)
    assert res.pressure[n1] == pytest.approx(expect_head_ft * PSI_PER_FT, abs=1e-3)
    assert res.flow[0] == pytest.approx(500.0, rel=1e-6)


def test_single_pipe_lps_si_units():
    """Same network in SI (LPS): lengths m, diameter mm, pressure m."""
    txt = """
[JUNCTIONS]
 N1 0 31.5
[RESERVOIRS]
 R1 30.5
[PIPES]
 P1 R1 N1 305 300 100 0 Open
[OPTIONS]
 UNITS LPS
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""
    ns = _tight(build_state(parse_inp(txt)))
    res = api_solve(ns, backend="py")
    q_cfs = 31.5 * CFS_PER_LPS
    h_ft = _hw_headloss_ft(305.0 * FT_PER_M, 0.300 * FT_PER_M, 100.0, q_cfs)
    expect_head_m = 30.5 - h_ft / FT_PER_M
    n1 = ns.node_names.index("N1")
    assert res.head[n1] == pytest.approx(expect_head_m, abs=1e-4)
    # SI pressure is reported in meters of head above elevation (elev 0)
    assert res.pressure[n1] == pytest.approx(expect_head_m, abs=1e-4)


def test_parallel_pipes_split_evenly_series_losses_add():
    """Two identical parallel pipes halve the flow (symmetry); two series
    pipes add their losses — both hand-computable."""
    txt = """
[JUNCTIONS]
 N1 0 0
 N2 0 800
[RESERVOIRS]
 R1 120
[PIPES]
 PA R1 N1 800 10 110 0 Open
 PB R1 N1 800 10 110 0 Open
 PC N1 N2 600 10 110 0 Open
[OPTIONS]
 UNITS GPM
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""
    ns = _tight(build_state(parse_inp(txt)))
    res = api_solve(ns, backend="py")
    q = 800.0 * CFS_PER_GPM
    d = 10.0 / 12.0
    h_par = _hw_headloss_ft(800.0, d, 110.0, q / 2.0)
    h_ser = _hw_headloss_ft(600.0, d, 110.0, q)
    i1, i2 = ns.node_names.index("N1"), ns.node_names.index("N2")
    assert res.flow[0] == pytest.approx(400.0, rel=1e-5)
    assert res.flow[1] == pytest.approx(400.0, rel=1e-5)
    assert res.head[i1] == pytest.approx(120.0 - h_par, abs=2e-4)
    assert res.head[i2] == pytest.approx(120.0 - h_par - h_ser, abs=2e-4)


def test_pump_one_point_curve_manual_rule():
    """EPANET manual: a 1-point curve (q1,h1) implies shutoff head 4/3·h1
    and h = h0 − r q² with r = (h0−h1)/q1². Demand q1 ⇒ gain exactly h1."""
    txt = """
[JUNCTIONS]
 N1 0 600
[RESERVOIRS]
 R1 50
[PUMPS]
 PU1 R1 N1 HEAD C1
[CURVES]
 C1 600 90
[OPTIONS]
 UNITS GPM
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""
    ns = _tight(build_state(parse_inp(txt)))
    res = api_solve(ns, backend="py")
    n1 = ns.node_names.index("N1")
    # operating exactly at the design point: gain = h1 = 90 ft
    assert res.head[n1] == pytest.approx(50.0 + 90.0, abs=1e-3)
    # off-design check via the quadratic rule at half the design flow
    ns2 = _tight(build_state(parse_inp(txt.replace("N1 0 600", "N1 0 300"))))
    res2 = api_solve(ns2, backend="py")
    q1 = 600.0 * CFS_PER_GPM
    h0 = 4.0 / 3.0 * 90.0
    r = (h0 - 90.0) / q1**2
    gain = h0 - r * (q1 / 2.0) ** 2
    assert res2.head[n1] == pytest.approx(50.0 + gain, abs=1e-3)


def test_pump_three_point_curve_passes_through_points():
    """The 3-point fit passes through its data points: demand = mid-point
    flow ⇒ head gain = mid-point head exactly (here in SI: heads in m)."""
    txt = """
[JUNCTIONS]
 N1 0 30
[RESERVOIRS]
 R1 20
[PUMPS]
 PU1 R1 N1 HEAD C1
[CURVES]
 C1 0 70
 C1 30 55
 C1 60 20
[OPTIONS]
 UNITS LPS
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""
    ns = _tight(build_state(parse_inp(txt)))
    res = api_solve(ns, backend="py")
    n1 = ns.node_names.index("N1")
    assert res.head[n1] == pytest.approx(20.0 + 55.0, abs=1e-3)


# ---------------------------------------------------------------------------
# 2. first-principles certificates
# ---------------------------------------------------------------------------


def _certify(ns, raw, mass_tol=1e-4, energy_tol=2e-3, setting_tol=1e-3):
    cert = solver_certify.certify(ns, raw.head, raw.flow, raw.status)
    assert cert.status_ok, cert.violations
    assert cert.mass < mass_tol, f"mass balance violated: {cert.mass} cfs"
    assert cert.energy < energy_tol, f"energy equation violated: {cert.energy} ft"
    assert cert.setting < setting_tol, f"valve setting violated: {cert.setting}"
    return cert


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_certificates_randomized(seed):
    rng = np.random.default_rng(seed)
    txt = make_random_net(
        rng, with_pump=(seed % 2 == 0), with_tank=(seed % 3 != 2),
        with_valve=(seed != 1),
    )
    ns = _tight(build_state(parse_inp(txt)))
    raw = solver_py.solve(ns)
    assert raw.converged
    _certify(ns, raw)


def _controlling_valve_state(vtype, setting):
    """A NetworkState where the valve actually regulates: PRV throttles a
    fixed demand; PSV/FCV/PBV regulate on the two-reservoir bridge where
    flow is a free variable (EPANET's defining layout for them)."""
    if vtype in ("PRV", "TCV"):
        txt = _valve_net(vtype, setting)
    elif vtype == "PSV":
        txt = _bridge_net("PSV", setting, d1=100.0, l1=1000.0)
    else:
        txt = _bridge_net(vtype, setting)
    return build_state(parse_inp(txt))


@pytest.mark.parametrize("vtype,setting", [
    ("PRV", 40.0), ("PSV", 40.0), ("FCV", 3.0), ("TCV", 12.0), ("PBV", 5.0),
])
def test_certificates_active_valves(vtype, setting):
    ns = _tight(_controlling_valve_state(vtype, setting))
    if vtype == "PBV":
        # the PBV penalty formulation (P=CBIG, also EPANET's) has a relative
        # convergence floor ~1e-5; use a realistic accuracy + mass tolerance
        ns.accuracy = 1e-4
    raw = solver_py.solve(ns)
    assert raw.converged
    _certify(ns, raw, mass_tol=1e-3 if vtype == "PBV" else 1e-4)
    vi = np.where(ns.link_type == 2)[0][0]
    if vtype != "TCV":
        assert raw.status[vi] == ACTIVE


def test_fcv_infeasible_setting_keeps_continuity():
    """FCV setting (4 L/s) below a hard downstream demand (8 L/s): the
    demand-driven problem is infeasible through an exact flow constraint.
    EPANET's fcvcoeff models the active FCV as a fixed-flow injection with
    a *tiny* conductance, so junction continuity stays exact and the head
    difference across the valve blows up instead (then warn 6 / pressure
    filters flag the scene). Regression for the certificate-found gap where
    the junction block went singular and mass balance broke by 0.07 cfs."""
    # EPANET-default accuracy: the CBIG-compliance flow (demand deficit
    # pushed through a 1e-8 conductance) sets a relative-error floor that
    # a 1e-9 target can never cross
    ns = build_state(parse_inp(_valve_net("FCV", 4.0)))
    raw = solver_py.solve(ns)
    assert raw.converged
    cert = solver_certify.certify(ns, raw.head, raw.flow, raw.status)
    assert cert.mass < 1e-4, f"continuity broken: {cert.mass} cfs"
    # the valve passes the full demand only via an enormous head drop
    vi = np.where(ns.link_type == 2)[0][0]
    assert raw.head[ns.node1[vi]] - raw.head[ns.node2[vi]] > 1e5
    res = api_solve(ns, backend="py")
    assert res.warn_code == 6  # negative pressure at a demand junction


@pytest.mark.skipif(not solver_cpp.is_available(),
                    reason="libhydraulic.so not built")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_certificates_cpp_backend(seed):
    rng = np.random.default_rng(seed)
    txt = make_random_net(rng, with_pump=True, with_valve=(seed != 1))
    ns = _tight(build_state(parse_inp(txt)))
    raw = solver_cpp.solve_raw(ns)
    assert raw.converged
    _certify(ns, raw)


# ---------------------------------------------------------------------------
# 3. independent scipy root-finder engine
# ---------------------------------------------------------------------------


def _agree(ns, raw):
    alt = solver_root.solve(ns, raw.status)
    np.testing.assert_allclose(alt.head, raw.head, rtol=1e-6, atol=2e-3)
    np.testing.assert_allclose(alt.flow, raw.flow, rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_root_engine_agrees_randomized(seed):
    rng = np.random.default_rng(seed)
    txt = make_random_net(
        rng, with_pump=(seed % 2 == 0), with_valve=(seed != 1),
    )
    ns = _tight(build_state(parse_inp(txt)))
    raw = solver_py.solve(ns)
    assert raw.converged
    _agree(ns, raw)


@pytest.mark.parametrize("vtype,setting", [
    ("PRV", 40.0), ("PSV", 40.0), ("FCV", 3.0), ("PBV", 5.0),
])
def test_root_engine_agrees_active_valves(vtype, setting):
    ns = _tight(_controlling_valve_state(vtype, setting))
    if vtype == "PBV":
        ns.accuracy = 1e-4
    raw = solver_py.solve(ns)
    assert raw.converged
    # the valve must actually be controlling in these fixtures
    vi = np.where(ns.link_type == 2)[0][0]
    assert raw.status[vi] == ACTIVE
    _agree(ns, raw)


def test_root_engine_multi_reservoir():
    """Two reservoirs at different heads competing through a junction."""
    txt = """
[JUNCTIONS]
 N1 0 6
[RESERVOIRS]
 R1 60
 R2 40
[PIPES]
 P1 R1 N1 400 250 120 0 Open
 P2 R2 N1 400 250 120 0 Open
[OPTIONS]
 UNITS LPS
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""
    ns = _tight(build_state(parse_inp(txt)))
    raw = solver_py.solve(ns)
    assert raw.converged
    _certify(ns, raw)
    _agree(ns, raw)


def test_root_engine_darcy_weisbach():
    rng = np.random.default_rng(7)
    txt = make_random_net(rng, with_pump=False, with_valve=False)
    txt = txt.replace("HEADLOSS H-W", "HEADLOSS D-W")
    ns = _tight(build_state(parse_inp(txt)))
    raw = solver_py.solve(ns)
    assert raw.converged
    _certify(ns, raw)
    _agree(ns, raw)


def test_root_engine_chezy_manning():
    # realistic Manning n (the HW-C range of make_random_net would be an
    # absurd n and produce astronomically stiff pipes)
    txt = """
[JUNCTIONS]
 N1 2 3
 N2 0 5
[RESERVOIRS]
 R1 45
[PIPES]
 P1 R1 N1 400 300 0.013 0 Open
 P2 N1 N2 300 250 0.015 0 Open
 P3 R1 N2 500 200 0.013 0 Open
[OPTIONS]
 UNITS LPS
 HEADLOSS C-M
[TIMES]
 DURATION 0
[END]
"""
    ns = _tight(build_state(parse_inp(txt)))
    raw = solver_py.solve(ns)
    assert raw.converged
    _certify(ns, raw)
    _agree(ns, raw)
