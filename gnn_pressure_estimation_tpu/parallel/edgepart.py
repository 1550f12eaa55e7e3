"""Edge-partitioned graphs: shard the disjoint-union batch across devices.

The GNN analog of sequence parallelism (SURVEY.md §5 "long-context"): nodes
are partitioned into contiguous blocks, each device owns the edges whose
*receiver* is local, and every message-passing layer all-gathers the node
feature blocks over ICI before the local gather + segment-sum. The reference
has no multi-device story at all; BASELINE.json names this axis explicitly
("edge-partitioning the WDN graph, exchanging boundary node features over
ICI").

Layout produced here (consumed inside ``shard_map``):

- global nodes padded to ``n_parts`` equal blocks (padding nodes are
  isolated: no edges, zero inverse degree)
- per-device edge lists padded to the max per-device count; ``edge_mask``
  flags real edges; receivers are local ids, senders global ids
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from gnn_pressure_estimation_tpu.core.graph import BatchedGraph, GraphTemplate


@dataclasses.dataclass(frozen=True)
class GraphPartition:
    """Host-side [P, ...] stacks; slice row ``p`` inside shard_map to get the
    local :class:`BatchedGraph` (``axis_name`` set)."""

    n_parts: int
    n_node_global: int      # padded total nodes (n_parts * block)
    block: int              # nodes per device
    n_graph: int
    nodes_per_graph: int
    senders: np.ndarray         # [P, E_max] global ids
    receivers: np.ndarray       # [P, E_max] local ids
    edge_mask: np.ndarray       # [P, E_max]
    senders_sl: np.ndarray
    receivers_sl: np.ndarray
    edge_mask_sl: np.ndarray
    inv_degree: np.ndarray      # [P, block]
    gcn_norm: np.ndarray        # [P, E_max_sl]
    cheb_norm: np.ndarray       # [P, E_max]
    edge_attr: np.ndarray | None  # [P, E_max, D]
    node_graph_id: np.ndarray   # [P, block]

    def local_graph(self, arrays: dict) -> BatchedGraph:
        """Build the device-local BatchedGraph from sliced [1, ...] arrays
        (inside shard_map; leading axis squeezed)."""
        sq = {k: (v[0] if v is not None else None) for k, v in arrays.items()}
        return BatchedGraph(
            senders=sq["senders"],
            receivers=sq["receivers"],
            senders_sl=sq["senders_sl"],
            receivers_sl=sq["receivers_sl"],
            inv_degree=sq["inv_degree"],
            gcn_norm=sq["gcn_norm"],
            cheb_norm=sq["cheb_norm"],
            edge_attr=sq.get("edge_attr"),
            node_graph_id=sq["node_graph_id"],
            n_node=self.block,
            n_edge=int(self.senders.shape[1]),
            n_graph=self.n_graph,
            nodes_per_graph=self.nodes_per_graph,
            edge_mask=sq["edge_mask"],
            edge_mask_sl=sq["edge_mask_sl"],
            axis_name="graph",
        )

    def device_arrays(self) -> dict:
        """The pytree of [P, ...] arrays to pass through shard_map with
        ``P('graph', ...)`` sharding on the leading axis."""
        out = {
            "senders": jnp.asarray(self.senders),
            "receivers": jnp.asarray(self.receivers),
            "edge_mask": jnp.asarray(self.edge_mask),
            "senders_sl": jnp.asarray(self.senders_sl),
            "receivers_sl": jnp.asarray(self.receivers_sl),
            "edge_mask_sl": jnp.asarray(self.edge_mask_sl),
            "inv_degree": jnp.asarray(self.inv_degree),
            "gcn_norm": jnp.asarray(self.gcn_norm),
            "cheb_norm": jnp.asarray(self.cheb_norm),
            "node_graph_id": jnp.asarray(self.node_graph_id),
        }
        if self.edge_attr is not None:
            out["edge_attr"] = jnp.asarray(self.edge_attr)
        return out


def _partition_edges(senders, receivers, weights, n_parts, block, pad_to):
    """Assign each edge to the device owning its receiver; pad to pad_to."""
    P = n_parts
    out_s = np.zeros((P, pad_to), np.int32)
    out_r = np.zeros((P, pad_to), np.int32)
    out_m = np.zeros((P, pad_to), bool)
    out_w = [np.zeros((P, pad_to), np.float32) for _ in weights]
    part = receivers // block
    for p in range(P):
        sel = part == p
        e = int(sel.sum())
        out_s[p, :e] = senders[sel]
        out_r[p, :e] = receivers[sel] - p * block
        out_m[p, :e] = True
        for wi, w in enumerate(weights):
            out_w[wi][p, :e] = w[sel]
    return out_s, out_r, out_m, out_w


def partition_graph(
    template: GraphTemplate, batch_size: int, n_parts: int
) -> GraphPartition:
    """Partition the ``batch_size`` disjoint union of ``template`` into
    ``n_parts`` contiguous node blocks (padding the tail block)."""
    B, n = batch_size, template.n_node
    n_total = B * n
    block = -(-n_total // n_parts)
    n_pad = block * n_parts

    offs = (np.arange(B, dtype=np.int32) * n)[:, None]
    senders = (template.senders[None, :] + offs).reshape(-1)
    receivers = (template.receivers[None, :] + offs).reshape(-1)
    senders_sl = (template.senders_sl[None, :] + offs).reshape(-1)
    receivers_sl = (template.receivers_sl[None, :] + offs).reshape(-1)
    cheb = np.tile(template.cheb_norm, B)
    gcn = np.tile(template.gcn_norm, B)
    inv_deg = np.tile(template.inv_degree, B)
    node_gid = np.repeat(np.arange(B, dtype=np.int32), n)

    # per-device edge counts → common padded width
    part = receivers // block
    counts = np.bincount(part, minlength=n_parts)
    e_max = max(int(counts.max()), 1)
    part_sl = receivers_sl // block
    counts_sl = np.bincount(part_sl, minlength=n_parts)
    e_max_sl = max(int(counts_sl.max()), 1)

    weights = [cheb]
    if template.edge_attr is not None:
        ea = np.tile(template.edge_attr, (B, 1))
        weights += [ea[:, d] for d in range(ea.shape[1])]
    s, r, m, w = _partition_edges(senders, receivers, weights, n_parts, block, e_max)
    cheb_p = w[0]
    edge_attr_p = (
        np.stack(w[1:], axis=-1).astype(np.float32) if len(w) > 1 else None
    )
    s_sl, r_sl, m_sl, (gcn_p,) = _partition_edges(
        senders_sl, receivers_sl, [gcn], n_parts, block, e_max_sl
    )

    inv_deg_p = np.zeros((n_parts, block), np.float32)
    gid_p = np.zeros((n_parts, block), np.int32)
    flat_inv = np.concatenate([inv_deg, np.zeros(n_pad - n_total, np.float32)])
    flat_gid = np.concatenate(
        [node_gid, np.full(n_pad - n_total, B - 1, np.int32)]
    )
    for p in range(n_parts):
        inv_deg_p[p] = flat_inv[p * block : (p + 1) * block]
        gid_p[p] = flat_gid[p * block : (p + 1) * block]

    return GraphPartition(
        n_parts=n_parts,
        n_node_global=n_pad,
        block=block,
        n_graph=B,
        nodes_per_graph=n,
        senders=s,
        receivers=r,
        edge_mask=m,
        senders_sl=s_sl,
        receivers_sl=r_sl,
        edge_mask_sl=m_sl,
        inv_degree=inv_deg_p,
        gcn_norm=gcn_p,
        cheb_norm=cheb_p,
        edge_attr=edge_attr_p,
        node_graph_id=gid_p,
    )
