"""Token persistence, regenerate-from-store, and update_*_json injection.

Covers the reference's parameter audit trail (the ``token`` zarr array,
TokenGeneratorByRange.py:592-621), ``load_computed_params`` reuse (:628-633),
and the scenegenv7 update_*_json user-value injection family (:78-261).
"""

import json
import os

import numpy as np
import pytest

from gnn_pressure_estimation_tpu.data.inp import parse_inp, write_inp
from gnn_pressure_estimation_tpu.data.zarrzip import ZarrZipReader
from gnn_pressure_estimation_tpu.simgen import tokens as tk
from gnn_pressure_estimation_tpu.simgen.config import GenOptions, create_dummy_config
from gnn_pressure_estimation_tpu.simgen.netgen import make_minitown
from gnn_pressure_estimation_tpu.simgen.runner import generate, load_computed_params


@pytest.fixture(scope="module")
def gen_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("genrepro")
    inp = str(d / "mini.inp")
    write_inp(make_minitown(), inp)
    ini = str(d / "mini.ini")
    cfg = create_dummy_config(inp, out_path=ini, num_scenarios=12,
                              storage_root=str(d / "ds"))
    return d, inp, ini, cfg


def _opts(**kw):
    base = dict(gen_demand=True, gen_res_total_head=True,
                att="pressure,demand", batch_size=4, executors=1, seed=7)
    base.update(kw)
    return GenOptions(**base)


def test_token_persistence_and_regen(gen_env, tmp_path):
    d, inp, ini, cfg = gen_env
    zip1 = generate(ini, _opts())

    with ZarrZipReader(zip1) as r:
        tokens = r.read_array("token")
        meta = json.loads(r._get("token/.zarray"))
        p1 = {s: r.read_array(f"pressure/{s}") for s in ("train", "valid", "test")}
        d1 = {s: r.read_array(f"demand/{s}") for s in ("train", "valid", "test")}
    n_rows = sum(v.shape[0] for v in p1.values())
    assert tokens.shape[0] == n_rows
    wn = parse_inp(inp)
    n_feat = len(wn.junctions) + len(wn.reservoirs)  # demand + res head
    assert tokens.shape[1] == n_feat
    # reference layout: f8, Blosc-lz4 compressor, (batch, F) chunks
    assert meta["dtype"].endswith("f8")
    assert meta["compressor"]["id"] == "blosc"
    assert meta["compressor"]["cname"] == "lz4"
    assert load_computed_params(zip1).tobytes() == tokens.tobytes()

    # regenerate from the stored parameter matrix → byte-identical arrays
    import configparser

    cp = configparser.ConfigParser()
    cp.read(ini)
    cp.set("general", "storage_dir", str(tmp_path / "regen"))
    ini2 = str(tmp_path / "regen.ini")
    with open(ini2, "w") as f:
        cp.write(f)
    zip2 = generate(ini2, _opts(load_params=zip1, seed=999))
    with ZarrZipReader(zip2) as r:
        for s in ("train", "valid", "test"):
            assert r.read_array(f"pressure/{s}").tobytes() == p1[s].tobytes()
            assert r.read_array(f"demand/{s}").tobytes() == d1[s].tobytes()
        assert r.read_array("token").tobytes() == tokens.tobytes()


def test_update_json_injection_reaches_solve(gen_env, tmp_path):
    d, inp, ini, cfg = gen_env
    wn = parse_inp(inp)
    uid = wn.junctions[0].id
    inject = 1.75  # LPS
    import configparser

    cp = configparser.ConfigParser()
    cp.read(ini)
    cp.set("general", "storage_dir", str(tmp_path / "inj"))
    ini2 = str(tmp_path / "inj.ini")
    with open(ini2, "w") as f:
        cp.write(f)

    zip_path = generate(
        ini2, _opts(update_demand_json=json.dumps({uid: inject}))
    )
    with ZarrZipReader(zip_path) as r:
        tokens = r.read_array("token")
        demand = np.concatenate(
            [r.read_array(f"demand/{s}") for s in ("train", "valid", "test")]
        )
        names = r.read_attrs("")["ordered_names_by_attr"]["demand"]
    # the injected value is pinned in every stored parameter row...
    col = wn.junction_names.index(uid)
    np.testing.assert_allclose(tokens[:, col], inject)
    # ...and comes out of the hydraulic solve as that junction's demand
    np.testing.assert_allclose(demand[:, names.index(uid)], inject, rtol=1e-6)
    # while other junctions still vary scenario-to-scenario
    other = names.index(wn.junctions[1].id)
    assert np.std(demand[:, other]) > 0


def test_load_params_composes_with_injection(gen_env, tmp_path):
    """--load_params + update_*_json: the prior store's rows replay with the
    named element pinned (previously the injection was silently ignored)."""
    d, inp, ini, cfg = gen_env
    wn = parse_inp(inp)
    uid = wn.junctions[0].id
    zip1 = generate(ini, _opts())
    import configparser

    cp = configparser.ConfigParser()
    cp.read(ini)
    cp.set("general", "storage_dir", str(tmp_path / "lpinj"))
    ini2 = str(tmp_path / "lpinj.ini")
    with open(ini2, "w") as f:
        cp.write(f)
    zip2 = generate(ini2, _opts(load_params=zip1,
                                update_demand_json=json.dumps({uid: 2.5})))
    with ZarrZipReader(zip1) as r:
        t1 = r.read_array("token")
    with ZarrZipReader(zip2) as r:
        t2 = r.read_array("token")
    col = wn.junction_names.index(uid)
    np.testing.assert_allclose(t2[:, col], 2.5)       # pinned
    other = [c for c in range(t1.shape[1]) if c != col]
    np.testing.assert_array_equal(t2[:, other], t1[:, other])  # replayed


def test_injection_file_form_and_unknown_uid(gen_env, tmp_path):
    d, inp, ini, cfg = gen_env
    wn = parse_inp(inp)
    specs = tk.build_feature_specs(
        wn, cfg, GenOptions(gen_demand=True, gen_res_total_head=True)
    )
    demand_spec = specs[0]
    # @file form
    p = tmp_path / "inj.json"
    p.write_text(json.dumps({wn.junctions[0].id: 3.0}))
    mask, values = tk.parse_injection(f"@{p}", demand_spec.uids, demand_spec.length)
    assert mask.sum() == 1 and values[mask][0] == 3.0
    sampled = tk.sample_params(specs, 5, np.random.default_rng(0),
                               injections=[(mask, values), None])
    np.testing.assert_allclose(sampled[:, 0], 3.0)
    # unknown uid is an error, not a silent zero-fill
    with pytest.raises(ValueError, match="not in the network"):
        tk.parse_injection(json.dumps({"nope": 1.0}), demand_spec.uids,
                           demand_spec.length)


def test_debug_dump_renders(gen_env, tmp_path, capsys):
    d, inp, ini, cfg = gen_env
    import configparser

    cp = configparser.ConfigParser()
    cp.read(ini)
    store = str(tmp_path / "dbg")
    cp.set("general", "storage_dir", store)
    cp.set("general", "num_scenarios", "16")
    ini2 = str(tmp_path / "dbg.ini")
    with open(ini2, "w") as f:
        cp.write(f)
    logs = []
    generate(ini2, _opts(debug=True), log_fn=logs.append)
    assert os.path.exists(store + "_debug.png")
    assert any("hist10" in ln for ln in logs)
    assert any("feat_corr" in ln for ln in logs)
