"""Shared test helpers: random graph construction + dense NumPy oracles for
the message-passing layers (replaces activation-parity vs PyG, which is not
installable here; formulas follow the PyG layer definitions the reference
stacks — see docstrings in models/layers.py)."""

from __future__ import annotations

import numpy as np

from gnn_pressure_estimation_tpu.core.graph import GraphTemplate


def random_graph(rng, n=23, extra_edges=18, edge_dim=None, seed_attr=True):
    """Connected undirected random graph as a GraphTemplate (both directions)."""
    # spanning tree for connectivity
    pairs = set()
    for i in range(1, n):
        j = int(rng.integers(0, i))
        pairs.add((min(i, j), max(i, j)))
    while len(pairs) < (n - 1) + extra_edges:
        i, j = int(rng.integers(0, n)), int(rng.integers(0, n))
        if i != j:
            pairs.add((min(i, j), max(i, j)))
    und = np.array(sorted(pairs), dtype=np.int32)
    senders = np.concatenate([und[:, 0], und[:, 1]])
    receivers = np.concatenate([und[:, 1], und[:, 0]])
    edge_attr = None
    if edge_dim:
        per_und = rng.random((len(und), edge_dim)).astype(np.float32)
        edge_attr = np.concatenate([per_und, per_und], axis=0)
    return GraphTemplate(n, senders, receivers, edge_attr=edge_attr, name="rand")


def dense_adj(tpl: GraphTemplate, self_loops=False) -> np.ndarray:
    n = tpl.n_node
    A = np.zeros((n, n), np.float64)
    for s, r in zip(tpl.senders, tpl.receivers):
        A[r, s] = 1.0  # row = receiver, col = sender
    if self_loops:
        A += np.eye(n)
    return A


def dense_gat(x, tpl, w, att_src, att_dst, bias, heads, concat, slope=0.2):
    """Dense oracle for GATConv with self-loops (PyG semantics)."""
    n = tpl.n_node
    H = heads
    C = w.shape[1] // H
    xp = (x @ w).reshape(n, H, C)
    a_s = np.sum(xp * att_src.reshape(1, H, C), axis=-1)  # [n,H]
    a_d = np.sum(xp * att_dst.reshape(1, H, C), axis=-1)
    A = dense_adj(tpl, self_loops=True) > 0
    out = np.zeros((n, H, C))
    for i in range(n):
        nbrs = np.nonzero(A[i])[0]
        logits = a_s[nbrs] + a_d[i][None, :]  # [deg,H]
        logits = np.where(logits >= 0, logits, slope * logits)
        logits = logits - logits.max(axis=0, keepdims=True)
        alpha = np.exp(logits)
        alpha = alpha / alpha.sum(axis=0, keepdims=True)
        out[i] = np.einsum("dh,dhc->hc", alpha, xp[nbrs])
    out = out.reshape(n, H * C) if concat else out.mean(axis=1)
    return out + bias


def dense_cheb(x, tpl, w, bias=None):
    """Dense oracle for ChebConv (sym norm, lambda_max=2)."""
    A = dense_adj(tpl)
    deg = A.sum(1)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1)), 0.0)
    L = -(dinv[:, None] * A * dinv[None, :])  # scaled Laplacian, zero diag
    K = w.shape[0]
    tx_prev, tx = x, None
    out = x @ w[0]
    if K > 1:
        tx = L @ x
        out = out + tx @ w[1]
    for k in range(2, K):
        tx_next = 2 * L @ tx - tx_prev
        out = out + tx_next @ w[k]
        tx_prev, tx = tx, tx_next
    if bias is not None:
        out = out + bias
    return out
