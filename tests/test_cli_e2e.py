"""End-to-end CLI smoke: netgen → mkconfig → generate → train → eval.

Locks the full command surface (reference README.md:15-106 workflow) the
way a user drives it — network synthesis, config derivation, scenario
generation with the in-repo GGA solver, a short training run with
checkpointing, and a noisy evaluation through the batched scene path.
"""

import configparser
import os


from gnn_pressure_estimation_tpu.cli import main


def test_cli_full_workflow(tmp_path):
    d = str(tmp_path)
    inp = f"{d}/net.inp"
    ini = f"{d}/net.ini"
    ckdir = f"{d}/ckpt"

    assert main(["netgen", "--junctions", "24", "--reservoirs", "1",
                 "--tanks", "1", "--pumps", "1", "--valves", "1",
                 "--out", inp, "--seed", "3"]) == 0
    assert main(["mkconfig", "--wn_inp_path", inp, "--out", ini,
                 "--num_scenarios", "16"]) == 0

    cp = configparser.ConfigParser()
    cp.read(ini)
    cp.set("general", "storage_dir", f"{d}/data")
    with open(ini, "w") as fh:
        cp.write(fh)

    assert main(["generate", "--config", ini, "--executors", "2",
                 "--batch_size", "4", "--gen_demand",
                 "--gen_res_total_head"]) == 0
    zipf = f"{d}/data.zip"
    assert os.path.exists(zipf)

    assert main(["train", "--model", "gatres_small", "--dataset_paths", zipf,
                 "--input_paths", inp, "--epochs", "2", "--batch_size", "4",
                 "--mask_rate", "0.75", "--save_path", ckdir,
                 "--device", "cpu"]) == 0
    cks = [f for f in os.listdir(ckdir) if f.startswith("best_")]
    assert cks, "no checkpoint written"

    assert main(["eval", "--model", "gatres_small",
                 "--model_path", os.path.join(ckdir, cks[0]),
                 "--test_input_path", inp, "--test_type", "noisyNN",
                 "--num_test_trials", "2", "--batch_size", "1",
                 "--mask_rate", "0.5", "--mean_dmd", "0.05",
                 "--std_dmd", "0.1", "--device", "cpu",
                 "--gpu_warmup_times", "0"]) == 0

    # serving surface: reconstruct + export the full fields
    assert main(["infer", "--model", "gatres_small",
                 "--model_path", os.path.join(ckdir, cks[0]),
                 "--test_data_path", zipf, "--test_input_path", inp,
                 "--from_set", "test", "--observed", "random",
                 "--mask_rate", "0.5", "--batch_size", "2",
                 "--num_snapshots", "3", "--device", "cpu",
                 "--out_npz", f"{d}/preds.npz",
                 "--out_csv", f"{d}/preds.csv"]) == 0
    import numpy as np

    z = np.load(f"{d}/preds.npz")
    assert z["pred"].shape[0] == 3 and np.isfinite(z["pred"]).all()
    obs = z["observed"].astype(bool)
    # observed nodes are served at their given (true) values exactly
    np.testing.assert_allclose(z["pred"][:, obs], z["true"][:, obs],
                               rtol=1e-5)
    assert os.path.getsize(f"{d}/preds.csv") > 0

def test_edge_attr_override_parsing():
    """--use_data_edge_attrs maps CLI strings onto the preset contract
    (reference train.py:592: 'diameter| length| None')."""
    import pytest

    from gnn_pressure_estimation_tpu.cli import _edge_attrs
    from gnn_pressure_estimation_tpu.models import select_model

    class A:
        use_data_edge_attrs = None

    _, preset = select_model("mgcn")
    assert _edge_attrs(A(), preset) == preset.edge_attrs  # None = preset
    A.use_data_edge_attrs = "none"
    assert _edge_attrs(A(), preset) is None
    A.use_data_edge_attrs = "diameter"
    assert _edge_attrs(A(), preset) == ("diameter",)
    A.use_data_edge_attrs = "diameter, length"
    assert _edge_attrs(A(), preset) == ("diameter", "length")
    A.use_data_edge_attrs = "bogus"
    with pytest.raises(SystemExit):
        _edge_attrs(A(), preset)


def test_eval_from_set_all_num_tests_cap(tmp_path, capsys):
    """from_set=all stacks test+train+valid capped at --num_tests
    (reference get_stacked_set2 + --num_tests, evaluation.py:510,923)."""
    d = str(tmp_path)
    inp, ini, ckdir = f"{d}/net.inp", f"{d}/net.ini", f"{d}/ck"
    assert main(["netgen", "--junctions", "16", "--reservoirs", "1",
                 "--tanks", "0", "--pumps", "1", "--valves", "0",
                 "--out", inp, "--seed", "5"]) == 0
    assert main(["mkconfig", "--wn_inp_path", inp, "--out", ini,
                 "--num_scenarios", "12"]) == 0
    cp = configparser.ConfigParser()
    cp.read(ini)
    cp.set("general", "storage_dir", f"{d}/data")
    with open(ini, "w") as fh:
        cp.write(fh)
    assert main(["generate", "--config", ini, "--executors", "1",
                 "--batch_size", "4", "--gen_demand",
                 "--gen_res_total_head"]) == 0
    assert main(["train", "--model", "gatres_small",
                 "--dataset_paths", f"{d}/data.zip", "--input_paths", inp,
                 "--epochs", "1", "--batch_size", "2", "--mask_rate", "0.75",
                 "--save_path", ckdir, "--device", "cpu"]) == 0
    ck = [f for f in os.listdir(ckdir) if f.startswith("best_")][0]
    assert main(["eval", "--model", "gatres_small",
                 "--model_path", os.path.join(ckdir, ck),
                 "--test_data_path", f"{d}/data.zip",
                 "--test_input_path", inp, "--from_set", "all",
                 "--num_tests", "5", "--num_test_trials", "1",
                 "--batch_size", "2", "--mask_rate", "0.75",
                 "--device", "cpu", "--gpu_warmup_times", "0"]) == 0
    out = capsys.readouterr().out
    assert "average result of 1 runs" in out
