"""C++ solver component vs the NumPy oracle on randomized networks."""

import numpy as np
import pytest

from gnn_pressure_estimation_tpu.data.inp import parse_inp
from gnn_pressure_estimation_tpu.simgen.network_state import build_state
from gnn_pressure_estimation_tpu.simgen.solver_api import solve
from gnn_pressure_estimation_tpu.simgen import solver_cpp

pytestmark = pytest.mark.skipif(
    not solver_cpp.is_available(), reason="libhydraulic.so not built"
)


def make_random_net(rng, n=4, with_pump=True, with_tank=True, with_valve=True):
    lines = ["[JUNCTIONS]"]
    for i in range(n * n):
        lines.append(f" N{i} {rng.uniform(0, 30):.2f} {rng.uniform(0.2, 4):.3f}")
    lines.append("[RESERVOIRS]")
    lines.append(" R1 95")
    if with_tank:
        lines.append("[TANKS]")
        lines.append(" T1 60 5 0 10 20 0")
    lines.append("[PIPES]")
    pid = 0

    def add_pipe(a, b, status="Open"):
        nonlocal pid
        lines.append(
            f" P{pid} {a} {b} {rng.uniform(50, 600):.1f} {rng.uniform(120, 400):.1f} "
            f"{rng.uniform(70, 140):.1f} {rng.uniform(0, 2):.2f} {status}"
        )
        pid += 1

    for r in range(n):
        for c in range(n):
            i = r * n + c
            if c + 1 < n:
                add_pipe(f"N{i}", f"N{i+1}")
            if r + 1 < n:
                add_pipe(f"N{i}", f"N{i+n}")
    if with_tank:
        add_pipe("T1", f"N{n*n-1}")
    if with_pump:
        lines.append("[PUMPS]")
        lines.append(" PU1 R1 N0 HEAD C1")
        lines.append("[CURVES]")
        lines.append(" C1 0 70\n C1 30 55\n C1 60 20")
    else:
        add_pipe("R1", "N0")
    if with_valve:
        lines.append("[VALVES]")
        lines.append(f" V1 N1 N{n} 200 TCV {rng.uniform(1, 20):.1f} 0")
    lines += ["[OPTIONS]", " UNITS LPS", " HEADLOSS H-W", "[TIMES]", " DURATION 0", "[END]"]
    return "\n".join(lines)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cpp_matches_python_oracle(seed):
    rng = np.random.default_rng(seed)
    txt = make_random_net(rng, with_pump=(seed % 2 == 0), with_valve=(seed != 1))
    ns = build_state(parse_inp(txt))
    rp = solve(ns, backend="py")
    rc = solve(ns, backend="cpp")
    assert rp.converged and rc.converged, (rp.warn_code, rc.warn_code, rp.iterations)
    np.testing.assert_allclose(rc.head, rp.head, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(rc.flow, rp.flow, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(rc.demand, rp.demand)


@pytest.mark.parametrize("model", ["H-W", "D-W", "C-M"])
def test_cpp_matches_python_headloss_models(model):
    rng = np.random.default_rng(7)
    txt = make_random_net(rng, with_pump=False, with_valve=False, with_tank=False)
    rough = {"H-W": None, "D-W": 0.26, "C-M": 0.013}[model]
    if rough is not None:
        # rewrite roughness column to a model-appropriate magnitude
        out = []
        for line in txt.splitlines():
            toks = line.split()
            if len(toks) == 8 and toks[0].startswith("P"):
                toks[5] = str(rough)
                line = " " + " ".join(toks)
            out.append(line)
        txt = "\n".join(out).replace("HEADLOSS H-W", f"HEADLOSS {model}")
    ns = build_state(parse_inp(txt))
    rp = solve(ns, backend="py")
    rc = solve(ns, backend="cpp")
    assert rp.converged and rc.converged
    np.testing.assert_allclose(rc.head, rp.head, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(rc.flow, rp.flow, rtol=1e-4, atol=1e-4)
