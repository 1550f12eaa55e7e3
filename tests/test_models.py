import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_pressure_estimation_tpu.models import select_model, MODEL_REGISTRY
from gnn_pressure_estimation_tpu.models.gatres import GATRes
from helpers import random_graph


SMALL_OVERRIDES = {
    # shrink the heavyweight presets for CI-speed shape checks
    "gatres_small": dict(num_blocks=2, channels=8),
    "gatres_large": dict(num_blocks=2, channels=8),
    "gin": dict(num_blocks=3, channels=8),
    "gcn2": dict(num_blocks=3, channels=8),
    "gat": dict(num_blocks=3, channels=8),
    "chebnet": dict(channels=8),
    "graphconvwat": dict(channels=(12, 8, 6), ks=(10, 6, 4, 1)),
    "mgcn": dict(latent_dim=8, n_aggr=2),
}


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_model_forward_shapes(rng, name):
    over = SMALL_OVERRIDES.get(name)
    model, preset = select_model(name)
    model = type(model)(**{**{f.name: getattr(model, f.name) for f in model.__dataclass_fields__.values() if f.name not in ("parent", "name")}, **over})
    edge_dim = 2 if preset.edge_attrs else None
    tpl = random_graph(rng, n=16, extra_edges=8, edge_dim=edge_dim)
    g = tpl.batch(2)
    x = jnp.asarray(rng.standard_normal((32, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, g)
    out = model.apply(params, x, g)
    assert out.shape == (32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_gatres_param_count_matches_reference_formula():
    """Reference GATRes-small has lin0(1->32), 15 blocks, lin1(32->1).
    Per block: GATConv(32->32,2h): w 32*64 + att 2*2*32 + bias 64;
    GATConv(64->32,1h): w 64*32 + att 2*32 + bias 32.
    """
    model = GATRes(num_blocks=15, channels=32)
    tpl_rng = np.random.default_rng(0)
    from helpers import random_graph as rg
    tpl = rg(tpl_rng, n=10, extra_edges=4)
    g = tpl.batch(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((10, 1)), g)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    per_block = (32 * 64 + 2 * 2 * 32 + 64) + (64 * 32 + 2 * 32 + 32)
    expect = (1 * 32 + 32) + 15 * per_block + (32 * 1 + 1)
    assert n_params == expect


def test_gatres_jit_and_grad(rng):
    tpl = random_graph(rng, n=12, extra_edges=6)
    g = tpl.batch(2)
    model = GATRes(num_blocks=2, channels=8)
    x = jnp.asarray(rng.standard_normal((24, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, g)

    @jax.jit
    def loss_fn(p, x):
        out = model.apply(p, x, g)
        return jnp.mean(out**2)

    grads = jax.grad(loss_fn)(params, x)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    assert any(np.abs(np.asarray(a)).sum() > 0 for a in flat)


def test_remask_variants_forward(rng):
    from gnn_pressure_estimation_tpu.models.remask import GATResRemask, GATResRemaskStack

    tpl = random_graph(rng, n=14, extra_edges=6)
    g = tpl.batch(2)
    x = jnp.asarray(rng.standard_normal((28, 1)).astype(np.float32))
    mask = jnp.asarray(rng.random(28) < 0.5)
    for cls in (GATResRemask, GATResRemaskStack):
        model = cls(num_blocks=2, channels=8)
        params = model.init(jax.random.PRNGKey(0), x, g, mask)
        out = model.apply(params, x, g, mask)
        assert out.shape == (28, 1) and np.isfinite(np.asarray(out)).all()


def test_apply_model_knobs():
    """Shared knob-override helper (cli train/eval + perf tools): applies
    valid knobs with string->dtype mapping, rejects knobs the model lacks."""
    from gnn_pressure_estimation_tpu.models.presets import apply_model_knobs

    model, _ = select_model("gatres_small")
    m2 = apply_model_knobs(model, attn_impl="softmax", gate_dtype="float32")
    assert m2.attn_impl == "softmax" and m2.gate_dtype == jnp.float32
    # None leaves the preset value (and returns the same instance)
    assert apply_model_knobs(model) is model
    assert apply_model_knobs(model, gate_dtype=None).gate_dtype == model.gate_dtype
    # models without the knob raise instead of silently ignoring
    mgcn, _ = select_model("mgcn")
    with pytest.raises(ValueError, match="attn_impl"):
        apply_model_knobs(mgcn, attn_impl="softmax")
