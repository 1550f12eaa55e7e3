"""Per-layer activation parity harness vs the reference GATResMeanConv.

BASELINE.json's acceptance gate: "verify per-layer activations allclose
against the reference". torch_geometric cannot be installed in this
environment, so parity is a two-machine protocol:

1. HERE:  ``python tools/parity_export.py export --out parity.npz``
   exports a fixed graph, input, our GATRes weights (in torch layout), and
   our per-block activations.
2. On any machine with torch_geometric:
   ``python tools/parity_export.py reference --npz parity.npz``
   builds the reference ``GATResMeanConv`` (GraphModels.py:454-494), loads
   the exported weights into it, runs the same input, and appends its
   activations to the file.
3. ANYWHERE: ``python tools/parity_export.py compare --npz parity.npz``
   reports max abs/rel deviation per block.

Weight layout mapping (ours → PyG):
  lin0/kernel [in, nc]            → lin0.weight [nc, in] (transposed) + bias
  block_i/GATConv_0/w [in, H*C]   → blocks.i.conv1.lin.weight [H*C, in]
  block_i/GATConv_0/att_src [1,H,C] → blocks.i.conv1.att_src (same shape)
  block_i/GATConv_0/bias          → blocks.i.conv1.bias
  (GATConv_1 ↔ conv2; SimpleConv has no params)
  lin1/kernel [nc, 1]             → lin1.weight [1, nc] + bias
"""

from __future__ import annotations

import argparse

import numpy as np


def _build_fixture(num_blocks=15, nc=32, n=60, batch=2, seed=0,
                   agg_mode="dense", band_block=None, inp=None):
    import jax
    import jax.numpy as jnp

    # parity is a numeric check: run on CPU (fast startup, exact matmuls)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from gnn_pressure_estimation_tpu.core.graph import GraphTemplate
    from gnn_pressure_estimation_tpu.models.gatres import GATRes

    rng = np.random.default_rng(seed)
    if inp:
        # real network topology (e.g. inputs/bigtown.inp for the
        # banded-mode leg at the reference's Oosterbeek scale)
        from gnn_pressure_estimation_tpu.data.dataset import (
            build_template, get_keep_list,
        )
        from gnn_pressure_estimation_tpu.data.inp import parse_inp

        wn = parse_inp(inp)
        keep = get_keep_list(wn, "keep_junction", None, "pressure")
        tpl, _ = build_template(wn, keep, None, name="parity")
        n = tpl.n_node
        # undirected pairs for the torch legs (template stores both dirs)
        und = np.unique(
            np.sort(np.stack([tpl.senders, tpl.receivers], 1), axis=1), axis=0
        ).astype(np.int32)
    else:
        # connected random graph, both directions
        pairs = set()
        for i in range(1, n):
            pairs.add((int(rng.integers(0, i)), i))
        while len(pairs) < n + n // 2:
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        und = np.array(sorted(pairs), np.int32)
        senders = np.concatenate([und[:, 0], und[:, 1]])
        receivers = np.concatenate([und[:, 1], und[:, 0]])
        tpl = GraphTemplate(n, senders, receivers)
    graph = tpl.batch(batch, mode=agg_mode, band_block=band_block)
    x = rng.standard_normal((batch * n, 1)).astype(np.float32)

    model = GATRes(num_blocks=num_blocks, channels=nc)
    x0 = jnp.asarray(x)
    if agg_mode == "banded":
        x0 = graph.pack_nodes(x0, n)
    params = model.init(jax.random.PRNGKey(seed), x0, graph)
    return tpl, graph, x, model, params, und


def cmd_export(args):
    import jax.numpy as jnp

    tpl, graph, x, model, params, und = _build_fixture(
        args.num_blocks, args.nc, args.nodes, args.batch, args.seed,
        agg_mode=args.agg_mode, band_block=args.band_block, inp=args.inp,
    )
    if getattr(args, "ckpt", None):
        # export a real trained checkpoint's weights instead of a fresh init
        # (GATRes weights are graph-size agnostic, so any fixture graph works;
        # --num_blocks/--nc must match the checkpointed architecture)
        from flax import serialization

        from gnn_pressure_estimation_tpu.train.checkpoint import load_checkpoint

        raw, _, meta = load_checkpoint(args.ckpt)
        params = serialization.from_state_dict(params, raw)
        print(f"using weights from {args.ckpt} (epoch {meta.get('epoch')})")
    n = tpl.n_node
    x_in = jnp.asarray(x)
    if args.agg_mode == "banded":
        # banded forward runs in RCM-permuted padded node space; the
        # Pallas band kernels route per layer exactly as in training
        # (H·C ≥ 128 — use --nc 128 so they actually fire)
        x_in = graph.pack_nodes(x_in, n)
    out, state = model.apply(
        params, x_in, graph, capture_intermediates=True, mutable=["intermediates"]
    )
    inter = state["intermediates"]

    def unpack(a):
        if args.agg_mode == "banded":
            return np.asarray(graph.unpack_nodes(a, n))
        return np.asarray(a)

    payload = {
        "x": x,
        "edge_index_und": und.T,  # [2, n_und] undirected pairs
        "n": np.int64(n),
        "batch": np.int64(graph.n_graph),
        "num_blocks": np.int64(args.num_blocks),
        "nc": np.int64(args.nc),
        "agg_mode": np.bytes_(args.agg_mode.encode()),
        "ours_out": unpack(out),
    }
    p = params["params"]
    payload["w_lin0"] = np.asarray(p["lin0"]["kernel"]).T
    payload["b_lin0"] = np.asarray(p["lin0"]["bias"])
    payload["w_lin1"] = np.asarray(p["lin1"]["kernel"]).T
    payload["b_lin1"] = np.asarray(p["lin1"]["bias"])
    for i in range(args.num_blocks):
        blk = p[f"block_{i}"]
        for j, conv in enumerate(("GATConv_0", "GATConv_1")):
            c = blk[conv]
            payload[f"blk{i}_conv{j + 1}_lin_w"] = np.asarray(c["w"]).T
            payload[f"blk{i}_conv{j + 1}_att_src"] = np.asarray(c["att_src"])
            payload[f"blk{i}_conv{j + 1}_att_dst"] = np.asarray(c["att_dst"])
            payload[f"blk{i}_conv{j + 1}_bias"] = np.asarray(c["bias"])
        payload[f"ours_act_block_{i}"] = unpack(
            inter[f"block_{i}"]["__call__"][0]
        )
    np.savez_compressed(args.npz, **payload)
    print(f"exported fixture + ours activations → {args.npz}")


def cmd_reference(args):
    """Runs on a torch_geometric machine: loads exported weights into the
    reference architecture and records its activations."""
    import torch
    from torch_geometric.nn import GATConv, SimpleConv

    d = dict(np.load(args.npz))
    n, B = int(d["n"]), int(d["batch"])
    num_blocks, nc = int(d["num_blocks"]), int(d["nc"])

    # disjoint-union edge_index over B copies, both directions
    und = d["edge_index_und"]
    ei = []
    for b in range(B):
        off = b * n
        ei.append(np.concatenate([und + off, und[::-1] + off], axis=1))
    edge_index = torch.tensor(np.concatenate(ei, axis=1), dtype=torch.long)
    x = torch.tensor(d["x"])

    convs = []
    with torch.no_grad():
        for i in range(num_blocks):
            c1 = GATConv(nc, nc, 2, concat=True)
            c2 = GATConv(nc * 2, nc, 1, concat=False)
            for j, c in ((1, c1), (2, c2)):
                c.lin.weight.copy_(torch.tensor(d[f"blk{i}_conv{j}_lin_w"]))
                c.att_src.copy_(torch.tensor(d[f"blk{i}_conv{j}_att_src"]))
                c.att_dst.copy_(torch.tensor(d[f"blk{i}_conv{j}_att_dst"]))
                c.bias.copy_(torch.tensor(d[f"blk{i}_conv{j}_bias"]))
            convs.append((c1, c2))
        mean_conv = SimpleConv(aggr="mean")
        h = x @ torch.tensor(d["w_lin0"]).T + torch.tensor(d["b_lin0"])
        ref_acts = {}
        for i, (c1, c2) in enumerate(convs):
            h0 = h.clone()
            h = torch.relu(c1(h, edge_index))
            h = c2(h, edge_index)
            h = mean_conv(h, edge_index) + h0
            h = torch.relu(h)
            ref_acts[f"ref_act_block_{i}"] = h.numpy()
        out = h @ torch.tensor(d["w_lin1"]).T + torch.tensor(d["b_lin1"])
    d.update(ref_acts)
    d["ref_out"] = out.numpy()
    np.savez_compressed(args.npz, **d)
    print(f"reference activations appended → {args.npz}")


def cmd_torch_oracle(args):
    """Independent plain-torch (CPU, no torch_geometric) implementation of
    the PyG layer semantics the reference stacks — GATConv (self-loops,
    LeakyReLU 0.2, per-receiver softmax) and SimpleConv(aggr='mean') — per
    their documented math.  Runs HERE (torch_geometric is not installable in
    this image) and fills the same ``ref_act_*`` slots ``reference`` would,
    so ``compare`` closes the activation gate against a second framework.
    """
    import torch

    d = dict(np.load(args.npz))
    n, B = int(d["n"]), int(d["batch"])
    num_blocks, nc = int(d["num_blocks"]), int(d["nc"])

    und = d["edge_index_und"]
    src_l, dst_l = [], []
    for b in range(B):
        off = b * n
        s = np.concatenate([und[0] + off, und[1] + off])
        r = np.concatenate([und[1] + off, und[0] + off])
        src_l.append(s)
        dst_l.append(r)
    src = torch.tensor(np.concatenate(src_l), dtype=torch.long)
    dst = torch.tensor(np.concatenate(dst_l), dtype=torch.long)
    N = B * n
    # self-loop-augmented edge list (PyG GATConv add_self_loops default)
    loops = torch.arange(N)
    src_sl = torch.cat([src, loops])
    dst_sl = torch.cat([dst, loops])

    def gat(x, W, a_src, a_dst, bias, H, C, concat):
        xp = (x @ W.T).reshape(N, H, C)
        al_s = (xp * a_src).sum(-1)     # [N, H]
        al_d = (xp * a_dst).sum(-1)
        e = torch.nn.functional.leaky_relu(al_s[src_sl] + al_d[dst_sl], 0.2)
        # per-receiver softmax: subtract scatter-max, exp, normalize
        mx = torch.full((N, H), -1e30)
        mx = mx.scatter_reduce(0, dst_sl[:, None].expand_as(e), e, "amax")
        ex = torch.exp(e - mx[dst_sl])
        den = torch.zeros((N, H)).index_add_(0, dst_sl, ex)
        alpha = ex / den[dst_sl]
        msg = alpha[..., None] * xp[src_sl]
        out = torch.zeros((N, H, C)).index_add_(0, dst_sl, msg)
        out = out.reshape(N, H * C) if concat else out.mean(1)
        return out + bias

    def mean_conv(x):
        agg = torch.zeros_like(x).index_add_(0, dst, x[src])
        deg = torch.zeros(N).index_add_(0, dst, torch.ones(len(dst)))
        return agg / deg.clamp(min=1.0)[:, None]

    with torch.no_grad():
        x = torch.tensor(d["x"])
        h = x @ torch.tensor(d["w_lin0"]).T + torch.tensor(d["b_lin0"])
        for i in range(num_blocks):
            h0 = h.clone()
            h = torch.relu(gat(
                h, torch.tensor(d[f"blk{i}_conv1_lin_w"]),
                torch.tensor(d[f"blk{i}_conv1_att_src"]),
                torch.tensor(d[f"blk{i}_conv1_att_dst"]),
                torch.tensor(d[f"blk{i}_conv1_bias"]), 2, nc, True,
            ))
            h = gat(
                h, torch.tensor(d[f"blk{i}_conv2_lin_w"]),
                torch.tensor(d[f"blk{i}_conv2_att_src"]),
                torch.tensor(d[f"blk{i}_conv2_att_dst"]),
                torch.tensor(d[f"blk{i}_conv2_bias"]), 1, nc, False,
            )
            h = mean_conv(h) + h0
            h = torch.relu(h)
            d[f"ref_act_block_{i}"] = h.numpy()
        out = h @ torch.tensor(d["w_lin1"]).T + torch.tensor(d["b_lin1"])
    d["ref_out"] = out.numpy()
    d["ref_source"] = np.bytes_(b"plain-torch oracle (no torch_geometric)")
    np.savez_compressed(args.npz, **d)
    print(f"plain-torch oracle activations appended → {args.npz}")


def cmd_compare(args):
    d = np.load(args.npz)
    num_blocks = int(d["num_blocks"])
    if "ref_out" not in d:
        raise SystemExit("run the 'reference' step on a torch_geometric machine first")
    worst = 0.0
    for i in range(num_blocks):
        a, b = d[f"ours_act_block_{i}"], d[f"ref_act_block_{i}"]
        mx = float(np.abs(a - b).max())
        worst = max(worst, mx)
        print(f"block {i:2d}: max abs dev {mx:.3e}")
    mo = float(np.abs(d["ours_out"] - d["ref_out"]).max())
    print(f"output  : max abs dev {mo:.3e}")
    ok = max(worst, mo) < args.atol
    print("PARITY OK" if ok else "PARITY FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("export", "reference", "torch_oracle", "compare"):
        p = sub.add_parser(name)
        p.add_argument("--npz", default="parity.npz")
        if name == "export":
            p.add_argument("--num_blocks", type=int, default=15)
            p.add_argument("--nc", type=int, default=32)
            p.add_argument("--nodes", type=int, default=60)
            p.add_argument("--batch", type=int, default=2)
            p.add_argument("--seed", type=int, default=0)
            p.add_argument("--ckpt", default=None,
                           help="export this trained checkpoint's weights "
                                "(must match --num_blocks/--nc)")
            p.add_argument("--agg-mode", dest="agg_mode", default="dense",
                           choices=["dense", "banded", "padded"],
                           help="banded runs the forward through the RCM "
                                "band layout + Pallas band kernels "
                                "(interpret mode on CPU); activations are "
                                "unpacked to original node order for the "
                                "torch legs")
            p.add_argument("--band-block", dest="band_block", type=int,
                           default=None)
            p.add_argument("--inp", default=None,
                           help="use a real INP topology (e.g. "
                                "inputs/bigtown.inp) instead of the random "
                                "fixture graph")
        if name == "compare":
            p.add_argument("--atol", type=float, default=1e-3)
    a = ap.parse_args()
    {"export": cmd_export, "reference": cmd_reference,
     "torch_oracle": cmd_torch_oracle, "compare": cmd_compare}[a.cmd](a)
