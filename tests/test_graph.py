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


def test_continuous_time_encoder():
    """TGAT functional time basis (reference continuous_time_encoder.py:11)."""
    from antmmf_tpu.modules.encoders.graph_encoders import ContinuousTimeEncoder

    enc = ContinuousTimeEncoder(time_embed_dim=16)
    ts = jnp.asarray([[0.0], [1.0], [100.0]])
    v = enc.init(jax.random.PRNGKey(0), ts)
    out = enc.apply(v, ts)
    assert out.shape == (3, 16)
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)  # cos(0) basis
    enc2 = ContinuousTimeEncoder(time_embed_dim=16, expand_dim=8,
                                 use_linear_trans=True)
    v2 = enc2.init(jax.random.PRNGKey(0), ts)
    assert enc2.apply(v2, ts).shape == (3, 8)


def _chain_graph(n=6, d=8):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    edge_index = np.stack([np.concatenate([src, dst]),
                           np.concatenate([dst, src])])
    return jnp.asarray(x), jnp.asarray(edge_index)


def test_gat_encoder_edge_list():
    from antmmf_tpu.modules.encoders.graph_encoders import GATEncoder

    x, ei = _chain_graph()
    enc = GATEncoder(dim_out=4, hidden_size=8, num_heads=2, num_layers=2)
    v = enc.init(jax.random.PRNGKey(0), x, ei)
    out = enc.apply(v, x, ei)
    assert out.shape == (6, 4) and np.isfinite(np.asarray(out)).all()
    # messages flow: perturbing a neighbor changes a node's output
    x2 = x.at[0].add(10.0)
    out2 = enc.apply(v, x2, ei)
    assert not np.allclose(out[1], out2[1])


def test_gat_adj_matrix():
    from antmmf_tpu.modules.encoders.graph_encoders import GATAdjMatrix

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    adj = jnp.asarray((rng.uniform(size=(2, 5, 5)) > 0.5).astype(np.float32))
    adj = adj + jnp.eye(5)[None]  # self loops
    enc = GATAdjMatrix(dim_hid=8, dim_out=3, num_heads=2)
    v = enc.init(jax.random.PRNGKey(0), x, adj)
    out = enc.apply(v, x, adj)
    assert out.shape == (2, 5, 3)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0,
                               atol=1e-5)  # log-softmax rows


def test_naive_attention_and_delta_kg():
    from antmmf_tpu.modules.encoders.graph_encoders import (
        DeltaKGEncoder,
        NaiveAttentionBasedEncoder,
    )

    x, ei = _chain_graph()
    E = ei.shape[1]
    eattr = jnp.ones((E, 8))
    enc = NaiveAttentionBasedEncoder(node_embed_dim=8, edge_embed_dim=8,
                                     attn_heads=2, num_layers=2)
    v = enc.init(jax.random.PRNGKey(0), x, ei, eattr)
    out = enc.apply(v, x, ei, eattr)
    assert out.shape == (6, 8) and np.isfinite(np.asarray(out)).all()

    kg = DeltaKGEncoder(node_embed_dim=8, num_rel=3, time_embed_dim=4,
                        attn_heads=2, num_layers=2)
    etype = jnp.asarray(np.arange(E) % 3)
    etime = jnp.ones((E, 1))
    vk = kg.init(jax.random.PRNGKey(0), x, ei, etype, etime)
    outk = kg.apply(vk, x, ei, etype, etime)
    assert outk.shape == (6, 8)
    # time signal reaches the output
    outk2 = kg.apply(vk, x, ei, etype, etime * 50.0)
    assert not np.allclose(outk, outk2)
    # relation types matter
    outk3 = kg.apply(vk, x, ei, (etype + 1) % 3, etime)
    assert not np.allclose(outk, outk3)


def test_graph_decoders():
    """ClassifyDecoder / DeltaKGDecoder / FFNDecoder (reference
    modules/decoders/graph/)."""
    import antmmf_tpu.modules.graph_decoders as gd

    x = jnp.ones((4, 16))
    clf = gd.ClassifyDecoder(node_embed_dim=16, num_classes=3, layer_num=2)
    v = clf.init(jax.random.PRNGKey(0), x)
    assert clf.apply(v, x).shape == (4, 3)

    rng = np.random.default_rng(0)
    D = 8
    inp = {
        "node1_encoder_result": jnp.asarray(
            rng.standard_normal((4, D)).astype(np.float32)),
        "node2_encoder_result": jnp.asarray(
            rng.standard_normal((4, D)).astype(np.float32)),
        "head_neg_encoder_result": jnp.asarray(
            rng.standard_normal((2, 4, D)).astype(np.float32)),
        "tail_neg_encoder_result": jnp.asarray(
            rng.standard_normal((2, 4, D)).astype(np.float32)),
        "update_rel_embed": jnp.asarray(
            rng.standard_normal((5, D)).astype(np.float32)),
        "edge_type": jnp.asarray([0, 1, 2, 3]),
    }
    for dtype_name in ("TransE", "DTransE", "PairRE"):
        dec = gd.DeltaKGDecoder(decoder_type=dtype_name)
        pos, nh, nt, r = dec.init_with_output(jax.random.PRNGKey(0), inp)[0]
        assert pos.shape == (4,) and nh.shape == (2, 4) and nt.shape == (2, 4)
        assert r.shape == (4, D)
    # TransE identity: score(h, h+r, r) == 0
    ident = dict(inp)
    ident["node2_encoder_result"] = (
        inp["node1_encoder_result"]
        + inp["update_rel_embed"][inp["edge_type"]])
    pos, _, _, _ = gd.DeltaKGDecoder(decoder_type="TransE").init_with_output(
        jax.random.PRNGKey(0), ident)[0]
    np.testing.assert_allclose(np.asarray(pos), 0.0, atol=1e-5)

    ffn = gd.FFNDecoder(node_embed_dim=D, edge_embed_dim=D, num_classes=2,
                        num_layers=2, neg_self_adversarial=True)
    v = ffn.init(jax.random.PRNGKey(0), inp)
    logits, w = ffn.apply(v, inp, training=True)
    assert logits.shape == (1 + 2 + 2, 4, 2)  # [pos-group + neg groups, B, C]
    assert w.shape == (5, 4) and np.allclose(np.asarray(w[0]), 1.0)
    np.testing.assert_allclose(np.asarray(w[1:].sum(0)), 1.0, atol=1e-5)
    logits_eval, w_eval = ffn.apply(v, inp)
    assert w_eval is None


def test_global_pools():
    """Graph-level readouts (reference utils/glob.py)."""
    from antmmf_tpu.utils.scatter import (
        global_add_pool,
        global_max_pool,
        global_mean_pool,
    )

    x = jnp.asarray([[1.0], [2.0], [3.0]])
    b = jnp.asarray([0, 0, 1])
    assert global_add_pool(x, b, 2).tolist() == [[3.0], [3.0]]
    assert global_mean_pool(x, b, 2).tolist() == [[1.5], [3.0]]
    assert global_max_pool(x, b, 2).tolist() == [[2.0], [3.0]]


def test_graphnorm_and_qkv_norm_options():
    """GraphNorm (per-graph stats with learnable mean scale, kgrl GraphNorm
    behind the reference QKVGraphConv norm_type) + the conv's norm wiring."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from antmmf_tpu.modules.encoders.graph_encoders import (
        GraphNorm, QKVGraphConv)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32))
    batch = jnp.asarray([0, 0, 0, 1, 1, 1])
    gn = GraphNorm()
    variables = gn.init(jax.random.PRNGKey(0), x, batch, 2)
    out = gn.apply(variables, x, batch, 2)
    # alpha=1 init: per-graph zero mean / unit variance
    for g in range(2):
        seg = np.asarray(out)[np.asarray(batch) == g]
        np.testing.assert_allclose(seg.mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(seg.var(0), 1.0, atol=1e-3)

    ei = jnp.asarray([[0, 1, 2, 3, 4], [1, 2, 0, 4, 5]])
    for nt in (None, "LayerNorm", "GraphNorm"):
        conv = QKVGraphConv(8, 2, norm_type=nt)
        v = conv.init(jax.random.PRNGKey(1), x, ei, None, batch, 2)
        y = conv.apply(v, x, ei, None, batch, 2)
        assert y.shape == (6, 8) and np.isfinite(np.asarray(y)).all()
