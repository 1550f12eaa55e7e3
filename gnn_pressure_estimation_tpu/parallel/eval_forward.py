"""SPMD forward pass for evaluation over a ``("data", "graph")`` mesh.

The Evaluator's per-trial forwards reuse MeshTrainer's two partitioning
strategies (parallel/trainer.py) without its optimizer machinery:

- **graphs** (small templates): the dense batched graph is replicated and
  the flat ``[bs·n, C]`` snapshot batch is sharded over both mesh axes;
  GSPMD partitions the per-graph dense operators.
- **halo** (large/banded templates): the RCM band's block-rows are sharded
  over the ``graph`` axis and each layer exchanges only halo rows with ring
  neighbors (parallel/halo.py) — the same kernels and traffic pattern as
  distributed training, so large-graph noisy evaluation is no longer pinned
  to one device (reference protocol: evaluation.py:240-347 is strictly
  single-GPU).

``make_mesh_forward`` returns ``(fwd, adapter)`` where ``adapter`` exposes
the ``BatchedGraph`` banded interface (``banded``/``pack_nodes``/
``unpack_nodes``) the harness already drives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
from gnn_pressure_estimation_tpu.parallel.halo import build_halo_partition


class _HaloAdapter:
    """BatchedGraph-compatible pack/unpack into the distributed band space
    ([bs·n, C] original order ↔ [bs_pad·n_pad_dist, C] band order)."""

    banded = True

    def __init__(self, part, bs: int, dp: int, n: int):
        self.part = part
        self.bs = bs
        self.bs_pad = -(-bs // dp) * dp
        self.n = n
        self.perm = jnp.asarray(part.perm)
        self.inv_perm = jnp.asarray(np.argsort(part.perm))
        self.n_pad_dist = part.n_pad_dist

    def pack_nodes(self, x_flat: jax.Array, n_orig: int) -> jax.Array:
        xb = x_flat.reshape(self.bs, n_orig, -1)
        xb = jnp.take(xb, self.perm, axis=1)
        xb = jnp.pad(xb, ((0, self.bs_pad - self.bs),
                          (0, self.n_pad_dist - n_orig), (0, 0)))
        return xb.reshape(self.bs_pad * self.n_pad_dist, -1)

    def unpack_nodes(self, x_flat: jax.Array, n_orig: int) -> jax.Array:
        xb = x_flat.reshape(self.bs_pad, self.n_pad_dist, -1)[: self.bs]
        xb = jnp.take(xb, self.inv_perm, axis=1)
        return xb.reshape(self.bs * n_orig, -1)


def make_mesh_forward(
    model,
    template: GraphTemplate,
    bs: int,
    mesh: Mesh,
    agg_mode: Optional[str] = None,
    band_block: Optional[int] = None,
):
    """(fwd(params, x_in) → out, graph-or-adapter) over ``mesh``.

    Strategy selection mirrors MeshTrainer: halo for banded/large templates,
    replicated-graph GSPMD sharding otherwise.
    """
    dp = mesh.shape["data"]
    gp = mesh.shape["graph"]
    large = template.n_node > GraphTemplate.DENSE_THRESHOLD
    halo = agg_mode == "banded" or (agg_mode is None and large)

    if not halo:
        graph = template.batch(bs, mode=agg_mode, band_block=band_block)
        rep = NamedSharding(mesh, P())
        xsh = NamedSharding(mesh, P(("data", "graph"), None))

        fwd = jax.jit(
            lambda params, x_in: model.apply(params, x_in, graph),
            in_shardings=(rep, xsh),
            out_shardings=rep,
        )
        return fwd, graph

    if band_block is not None:
        template.band_layout(band_block)  # seed the partition's layout
    part = build_halo_partition(template, gp)
    adapter = _HaloAdapter(part, bs, dp, template.n_node)
    B_local = adapter.bs_pad // dp
    garr = {
        name: jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P("graph"))
        )
        for name, a in part.band_arrays.items()
    }

    def local_fwd(params, x, arrs):
        graph = part.local_graph(arrs, B_local)
        out = model.apply(params, x.reshape(-1, x.shape[-1]), graph)
        # reshape by the model's own output width (out_channels need not
        # equal the input feature dim)
        return out.reshape(B_local, part.chunk, out.shape[-1])

    sharded = shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(), P("data", "graph", None), {k: P("graph") for k in garr}),
        out_specs=P("data", "graph", None),
        check_vma=False,
    )

    @jax.jit
    def fwd(params, x_in):
        x3 = x_in.reshape(adapter.bs_pad, adapter.n_pad_dist, -1)
        out = sharded(params, x3, garr)
        return out.reshape(adapter.bs_pad * adapter.n_pad_dist, -1)

    return fwd, adapter
