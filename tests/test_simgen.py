"""simgen unit tests: formulas, feature layout, config creator, units."""

import numpy as np
import pytest

from gnn_pressure_estimation_tpu.data.inp import parse_inp, write_inp
from gnn_pressure_estimation_tpu.simgen import tokens as tk
from gnn_pressure_estimation_tpu.simgen import units as U
from gnn_pressure_estimation_tpu.simgen.config import (
    GenOptions,
    create_dummy_config,
    get_range,
)
from gnn_pressure_estimation_tpu.simgen.netgen import make_minitown


@pytest.fixture(scope="module")
def wn():
    return make_minitown()


def test_formula_range(rng):
    t = rng.random((4, 6))
    v = tk.values_by_range(t, 2.0, 5.0)
    assert v.min() >= 2.0 and v.max() <= 5.0
    np.testing.assert_allclose(v, 2.0 + t * 3.0)


def test_formula_bool():
    t = np.array([[0.1, 0.5, 0.9]])
    v = tk.boolean_values(t, 0.5)
    np.testing.assert_array_equal(v, [[1.0, 0.0, 0.0]])


def test_formula_ratio(rng):
    ori = np.array([10.0, 20.0, 30.0])
    t = rng.random((5, 3))
    v = tk.values_by_ratio(t, 0.1, 0.3, ori)
    assert v.max() <= 30.0 and (v >= 0).all()


def test_formula_ran_cluster(rng):
    ori = rng.random(30) * 10
    coords = rng.random((30, 2))
    t = rng.random((4, 30))
    v = tk.values_by_ran_cluster(
        t, 2.0, 8.0, ori, coords=coords, rng=rng,
        num_clusters_lo=2, num_clusters_hi=5, sigma=1.0,
    )
    assert v.shape == (4, 30)
    assert v.min() >= 2.0 and v.max() <= 8.0


def test_feature_layout_order(wn, tmp_path):
    """featlen order must follow the reference flag order: junctions, pipes,
    pumps, tanks, valves, reservoirs (scenegenv7.py:381-429)."""
    cfg = create_dummy_config(
        write_inp(wn, str(tmp_path / "m.inp")) and str(tmp_path / "m.inp")
    )
    opts = GenOptions(
        gen_demand=True, gen_elevation=True, gen_roughness=True,
        gen_pump_speed=True, gen_tank_level=True, gen_valve_setting=True,
        gen_res_total_head=True,
    )
    wn2 = parse_inp(str(tmp_path / "m.inp"))
    specs = tk.build_feature_specs(wn2, cfg, opts)
    keys = [s.key.value for s in specs]
    assert keys == [
        "junc_demand", "junc_elevation", "pipe_roughness", "pump_speed",
        "tank_level", "valve_setting", "reservoir_totalhead",
    ]
    fl = tk.featlen_dict(specs)
    assert fl["junc_demand"] == len(wn2.junctions)
    assert fl["pipe_roughness"] == len(wn2.pipes)

    params = tk.sample_params(specs, 3, np.random.default_rng(0))
    assert params.shape == (3, sum(fl.values()))
    split = tk.split_params(specs, params)
    assert split["junc_demand"].shape == (3, len(wn2.junctions))


def test_config_creator_ranges(wn, tmp_path):
    path = str(tmp_path / "n.inp")
    write_inp(wn, path)
    cfg = create_dummy_config(path, num_scenarios=42)
    assert cfg.getint("general", "num_scenarios") == 42
    dlo = cfg.getfloat("junction", "demand_lo")
    dhi = cfg.getfloat("junction", "demand_hi")
    assert dhi >= dlo >= 0
    assert cfg.getfloat("pipe", "diameter_lo") <= cfg.getfloat("pipe", "diameter_hi")
    assert cfg.has_section("reservoir")


def test_get_range_quantile():
    vals = np.arange(101, dtype=float)
    lo, hi = get_range(vals, "quantile", q=0.05)
    assert lo == pytest.approx(5.0) and hi == pytest.approx(95.0)


def test_units_roundtrip():
    q = np.array([12.5])
    for unit in U.FLOW_UNITS:
        cfs = U.flow_to_cfs(q, unit)
        np.testing.assert_allclose(U.flow_from_cfs(cfs, unit), q)
    # pressure conversion m <-> psi through feet of head
    m = np.array([30.0])
    psi = U.convert_result(m, "pressure", "LPS", "GPM")
    np.testing.assert_allclose(psi, 30.0 / U.FT * U.PSI_PER_FT)
    np.testing.assert_allclose(
        U.convert_result(psi, "pressure", "GPM", "LPS"), m
    )


def test_inp_roundtrip(wn, tmp_path):
    path = str(tmp_path / "rt.inp")
    write_inp(wn, path)
    wn2 = parse_inp(path)
    assert wn2.node_names == wn.node_names
    assert wn2.link_names == wn.link_names
    assert wn2.options.units == wn.options.units
    np.testing.assert_allclose(
        [j.base_demand for j in wn2.junctions],
        [j.base_demand for j in wn.junctions], rtol=1e-6,
    )


def test_mean_feature_corr_closed_form_matches_corrcoef():
    """mean_feature_corr's wide-matrix closed form must equal
    nanmean(corrcoef) exactly (incl. constant columns → NaN semantics);
    it replaces the O(n²) matrix at >2048 columns (a 23k-node network
    would otherwise materialize 4.2 GB per attribute for one scalar)."""
    import numpy as np

    from gnn_pressure_estimation_tpu.simgen.runner import mean_feature_corr

    rng = np.random.default_rng(3)
    df = rng.standard_normal((9, 2600))
    df[:, 5] = 2.0   # constant columns: NaN rows in corrcoef
    df[:, 77] = -4.0
    with np.errstate(invalid="ignore", divide="ignore"):
        ref = float(np.nanmean(np.corrcoef(df.T)))
    assert abs(mean_feature_corr(df) - ref) < 1e-12
    # narrow path (plain corrcoef) agrees with the wide path on the same data
    narrow = mean_feature_corr(df[:, :800])
    with np.errstate(invalid="ignore", divide="ignore"):
        ref_n = float(np.nanmean(np.corrcoef(df[:, :800].T)))
    assert abs(narrow - ref_n) < 1e-12


def test_executor_prv_setting_converts_psi_in_us_units():
    """gen_valve_setting on a US-unit network must convert the sampled PRV
    setting as PRESSURE (psi → ft of head, ÷0.4333), exactly like the INP
    path (network_state.py build_state).  Regression for a path split: the
    executor still used length_to_ft (a no-op for US units) after the INP
    path was fixed, so generated scenarios disagreed with the parsed INP by
    setting·(1/0.4333 − 1) ft of head."""
    import configparser

    from gnn_pressure_estimation_tpu.simgen.executor import ScenarioExecutor
    from gnn_pressure_estimation_tpu.simgen.network_state import build_state

    inp = """
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
    wn = parse_inp(inp)
    cfg = configparser.ConfigParser()
    cfg.add_section("valve")
    cfg.set("valve", "setting_prv_lo", "40")
    cfg.set("valve", "setting_prv_hi", "40")
    opts = GenOptions(gen_valve_setting=True)
    specs = tk.build_feature_specs(wn, cfg, opts)
    assert [s.key.value for s in specs] == ["valve_setting"]

    ex = ScenarioExecutor(wn, specs, None, opts)
    # sample_params maps the degenerate [40, 40] range to exactly 40 psi
    params = tk.sample_params(specs, 1, np.random.default_rng(0))
    np.testing.assert_allclose(params, [[40.0]])
    ns = ex.apply_tokens(params[0])
    li = list(wn.link_names).index("V1")
    expected_ft = U.pressure_to_ft(40.0, ns.units)
    assert abs(expected_ft - 40.0 / 0.4333) < 1e-3  # US: psi → ft
    assert abs(ns.valve_setting[li] - expected_ft) < 1e-9
    # and it matches what the same INP parses to (the fixed path)
    assert abs(build_state(wn).valve_setting[li] - expected_ft) < 1e-9
