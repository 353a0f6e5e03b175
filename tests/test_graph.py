import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.modules.graph import (
    CompGCNConv,
    CompGCNModel,
    GINConv,
    GINEConv,
    compgcn_compose,
)
from antmmf_tpu.utils.scatter import (
    scatter_add,
    scatter_max,
    scatter_mean,
    scatter_softmax,
)


def test_scatter_ops():
    src = jnp.array([1.0, 2.0, 3.0, 4.0])
    idx = jnp.array([0, 0, 1, 2])
    np.testing.assert_allclose(scatter_add(src, idx, 3), [3.0, 3.0, 4.0])
    np.testing.assert_allclose(scatter_mean(src, idx, 3), [1.5, 3.0, 4.0])
    np.testing.assert_allclose(scatter_max(src, idx, 3), [2.0, 3.0, 4.0])
    sm = scatter_softmax(src, idx, 3)
    np.testing.assert_allclose(scatter_add(sm, idx, 3), [1.0, 1.0, 1.0],
                               rtol=1e-6)


def test_scatter_mean_2d():
    src = jnp.ones((4, 3))
    idx = jnp.array([0, 0, 0, 1])
    out = scatter_mean(src, idx, 2)
    np.testing.assert_allclose(out, np.ones((2, 3)))


def test_gin_conv_aggregates_neighbors():
    x = jnp.eye(3)
    # edges 0→1, 2→1 (node 1 receives both)
    edge_index = jnp.array([[0, 2], [1, 1]])
    conv = GINConv(out_dim=3)
    params = conv.init(jax.random.PRNGKey(0), x, edge_index)
    out = conv.apply(params, x, edge_index)
    assert out.shape == (3, 3)
    # masked edges contribute nothing
    out_masked = conv.apply(params, x, edge_index, jnp.array([0.0, 0.0]))
    out_isolated = conv.apply(params, x, jnp.array([[0], [0]]),
                              jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_isolated),
                               atol=1e-6)


def test_gine_conv_uses_edge_attr():
    x = jnp.ones((3, 4))
    edge_index = jnp.array([[0, 1], [1, 2]])
    edge_attr = jnp.ones((2, 2))
    conv = GINEConv(out_dim=4)
    params = conv.init(jax.random.PRNGKey(0), x, edge_index, edge_attr)
    out = conv.apply(params, x, edge_index, edge_attr)
    assert out.shape == (3, 4)


def test_compgcn_compose_ops():
    h = jnp.array([[1.0, 2.0]])
    r = jnp.array([[0.5, 0.5]])
    np.testing.assert_allclose(compgcn_compose(h, r, "sub"), [[0.5, 1.5]])
    np.testing.assert_allclose(compgcn_compose(h, r, "mult"), [[0.5, 1.0]])
    corr = compgcn_compose(h, r, "corr")
    assert corr.shape == (1, 2) and np.isfinite(np.asarray(corr)).all()


def test_compgcn_model_link_prediction():
    E = 4  # 2 forward + 2 backward
    batch = {
        "edge_index": jnp.array([[0, 1, 2, 3], [2, 3, 0, 1]]),
        "edge_type": jnp.array([0, 1, 2, 3]),  # backward uses offset ids
        "head": jnp.array([0, 1]),
        "relation": jnp.array([0, 1]),
        "targets": jnp.array([2, 3]),
    }
    model = CompGCNModel(num_entities=5, num_relations=2, embed_dim=8)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out["logits"].shape == (2, 5)
    assert np.isfinite(float(out["losses"]["link_pred_loss"]))
