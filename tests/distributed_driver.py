"""Subprocess driver for the two-process jax.distributed test.

Invoked as ``python distributed_driver.py <coordinator> <nproc> <pid>``;
brings up 4 virtual CPU devices, joins the distributed runtime via
``init_distributed`` (parallel/trainer.py:259+), runs ONE MeshTrainer
"graphs"-strategy train step over the global 2-process × 4-device mesh, and
prints a JSON result line the parent test compares across processes and
against the single-process 8-device run.
"""

import json
import os
import re
import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np
    from jax.experimental import multihost_utils as mh
    from jax.sharding import PartitionSpec as P

    from gnn_pressure_estimation_tpu.models.gatres import GATRes
    from gnn_pressure_estimation_tpu.parallel import (
        MeshTrainer,
        init_distributed,
        make_mesh,
    )
    from gnn_pressure_estimation_tpu.train import TrainConfig
    from gnn_pressure_estimation_tpu.utils.scaling import NormStats

    init_distributed(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import random_graph

    rng = np.random.default_rng(5)
    tpl = random_graph(rng, n=20, extra_edges=12)
    model = GATRes(num_blocks=1, channels=4)
    cfg = TrainConfig(batch_size=8, mask_rate=0.5, criterion="mse",
                      donate_state=False, seed=3)
    mesh = make_mesh(dp=4, gp=2)
    mt = MeshTrainer(model, cfg, NormStats(), tpl, mesh)
    assert mt.strategy == "graphs"

    def to_global(tree, spec):
        host = jax.tree.map(np.asarray, tree)
        specs = jax.tree.map(lambda _: spec, host)
        return mh.host_local_array_to_global_array(host, mesh, specs)

    params = to_global(mt.params, P())
    opt_state = to_global(mt.opt_state, P())
    key = to_global(np.asarray(jax.random.PRNGKey(9)), P())

    x_full = rng.standard_normal((8 * tpl.n_node, 1)).astype(np.float32)
    rows = x_full.shape[0] // nproc
    x_local = x_full[pid * rows : (pid + 1) * rows]
    x = mh.host_local_array_to_global_array(
        x_local, mesh, P(("data", "graph"), None)
    )

    step = mt._get_train_step(tpl, 8)
    params2, _, loss, mets = step(params, opt_state, x, x, key)
    # global param norm proves the psum'd update is identical everywhere
    pn = float(sum(float(jax.numpy.sum(jax.numpy.abs(p)))
                   for p in jax.tree.leaves(params2)))
    print(json.dumps({
        "pid": pid,
        "loss": float(loss),
        "mae": float(mets["train_mae"]),
        "param_l1": pn,
    }), flush=True)
    mh.sync_global_devices("done")


if __name__ == "__main__":
    main()
