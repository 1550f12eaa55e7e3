"""ctypes binding for the C++ hydraulic solver (simgen/solver/hydraulic.cpp).

Auto-builds the shared library with the in-tree Makefile on first use
(g++ only; no pybind11 dependency — plain C ABI)."""

from __future__ import annotations

import ctypes as ct
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

from gnn_pressure_estimation_tpu.simgen.network_state import NetworkState
from gnn_pressure_estimation_tpu.simgen import solver_py

_DIR = os.path.join(os.path.dirname(__file__), "solver")
_SO = os.path.join(_DIR, "libhydraulic.so")
_LIB: Optional[ct.CDLL] = None

_dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_bp = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


# Freshness is source-hash-based, not mtime-based: a fresh checkout has
# arbitrary mtimes, so `make`'s timestamp rule could silently load a stale
# (or foreign-arch, -march=native) binary.  A sidecar <so>.hash records the
# sha256 of hydraulic.cpp the binary was built from; any mismatch — or a
# binary with no recorded provenance at all — forces a full rebuild, and a
# failed rebuild means NO cpp backend rather than a stale one.
_HASH_FILE = _SO + ".hash"


def _src_hash() -> str:
    with open(os.path.join(_DIR, "hydraulic.cpp"), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _is_fresh() -> bool:
    if not os.path.exists(_SO):
        return False
    try:
        with open(_HASH_FILE) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s", "-B"], check=True, capture_output=True,
            timeout=180,
        )
    except Exception:
        return False
    if not os.path.exists(_SO):
        return False
    try:
        with open(_HASH_FILE, "w") as f:
            f.write(_src_hash())
    except OSError:
        return False
    return True


def _load() -> Optional[ct.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _is_fresh() and not _build():
        return None
    lib = ct.CDLL(_SO)
    lib.hyd_solve.restype = ct.c_int
    lib.hyd_solve.argtypes = [
        ct.c_int, ct.c_int, ct.c_int,
        _dp, _dp, _dp,                 # elevation, fixed_head, demand
        _ip, _ip, _ip,                 # link_type, node1, node2
        _ip, _bp,                      # status_in, check_valve
        _dp, _dp, _dp, _dp,            # length, diameter, roughness, minor_loss
        _dp, _dp, _dp, _dp, _dp,       # pump h0/r/n/speed/power
        _ip, _dp,                      # valve_type, valve_setting
        ct.c_int, ct.c_double,         # headloss_model, viscosity
        ct.c_int, ct.c_double,         # max_iter, accuracy
        _dp, _dp, _ip,                 # head, flow, status_out
        ct.POINTER(ct.c_int),          # iters_out
    ]
    _LIB = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def solve_raw(ns: NetworkState) -> solver_py.SolverResult:
    lib = _load()
    if lib is None:
        raise RuntimeError("libhydraulic.so unavailable (build failed)")
    n, nj, L = ns.n_nodes, ns.n_junctions, len(ns.link_type)
    head = np.empty(n, np.float64)
    flow = np.empty(L, np.float64)
    status_out = np.empty(L, np.int32)
    iters = ct.c_int(0)

    def d(a):
        return np.ascontiguousarray(a, np.float64)

    def i(a):
        return np.ascontiguousarray(a, np.int32)

    warn = lib.hyd_solve(
        n, nj, L,
        d(ns.elevation), d(ns.fixed_head), d(ns.demand),
        i(ns.link_type), i(ns.node1), i(ns.node2),
        i(ns.status), np.ascontiguousarray(ns.check_valve, np.uint8),
        d(ns.length), d(ns.diameter), d(ns.roughness), d(ns.minor_loss),
        d(ns.pump_h0), d(ns.pump_r), d(ns.pump_n), d(ns.pump_speed),
        d(ns.pump_power),
        i(ns.valve_type), d(ns.valve_setting),
        int(ns.headloss_model), float(ns.viscosity),
        int(ns.trials), float(ns.accuracy),
        head, flow, status_out, ct.byref(iters),
    )
    return solver_py.SolverResult(
        head=head, flow=flow, status=status_out,
        warn_code=int(warn), converged=warn in (0,), iterations=int(iters.value),
    )
