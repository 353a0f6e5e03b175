"""Hierarchical-softmax stack: label tree, grouped classifier, path loss,
greedy decode (reference modules/utils.py:158-460 +
decoders/hierarchical_classifier.py:14-224)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import antmmf_tpu.datasets.processors  # noqa: F401 — registry side-effects
import antmmf_tpu.modules.losses.extended  # noqa: F401
from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.classifier import HierarchicalSoftmaxClassifier
from antmmf_tpu.modules.hier_tree import build_hier_tree, greedy_decode

# the reference docstring example (hierarchical_classifier.py:33-41)
SCHEMA = ["edu", {"fashion": ["cars", "tech_cars",
                              {"health": ["sports"]}]}, "pe"]


def test_tree_structure_and_groups():
    tree = build_hier_tree(SCHEMA)
    # groups: root{edu,fashion,pe}, fashion{cars,tech_cars,health},
    # health{sports}
    assert [g["num_outputs"] for g in tree.param_groups] == [3, 3, 1]
    assert tree.get_depth() == 3
    node = tree.get_node_from_label_str("fashion-health-sports")
    child_idx, groups, label_str = tree.get_node_info(node)
    assert label_str == "fashion-health-sports"
    assert child_idx == [1, 2, 0] and groups == [0, 1, 2]
    # independent trees don't leak state (the reference class-attr bug)
    t2 = build_hier_tree(["a", "b"])
    assert len(t2.param_groups) == 1 and len(tree.param_groups) == 3


def test_tree_from_file(tmp_path):
    f = tmp_path / "schema.txt"
    f.write_text("fashion-cars\nfashion-health-sports\nedu\n")
    tree = build_hier_tree(str(f))
    assert "sports" in tree.all_labels
    label, param = tree.encode_label_str("fashion-health-sports")
    assert (label >= 0).sum() == 3 and (param >= 0).sum() == 3


def test_encode_label_str_padding():
    tree = build_hier_tree(SCHEMA)
    label, param = tree.encode_label_str("edu")
    assert label.tolist()[0] == 0 and param.tolist()[0] == 0
    assert label.tolist()[1:] == [-1, -1] and param.tolist()[1:] == [-1, -1]


def test_classifier_loss_and_decode():
    tree = build_hier_tree(SCHEMA)
    clf = HierarchicalSoftmaxClassifier(
        hier_label_schema=tuple(
            e if isinstance(e, str) else e for e in SCHEMA))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    variables = clf.init(jax.random.PRNGKey(1), x)
    out = clf.apply(variables, x)
    assert [l.shape for l in out["hier_logits"]] == [(4, 3), (4, 3), (4, 1)]

    labels = ["edu", "fashion-cars", "fashion-health-sports", "pe"]
    enc = [tree.encode_label_str(s) for s in labels]
    batch = {"hier_label": np.stack([e[0] for e in enc]),
             "hier_param": np.stack([e[1] for e in enc])}
    loss_fn = registry.get_loss_class("hier_softmax_loss")()

    tx = optax.adam(0.1)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state):
        def of(v):
            return loss_fn(batch, clf.apply(v, x))

        loss, grads = jax.value_and_grad(of)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    first = None
    for _ in range(60):
        variables, opt_state, loss = step(variables, opt_state)
        first = float(loss) if first is None else first
    assert float(loss) < first  # path CE trains

    # greedy decode recovers the gold paths after overfitting
    out = clf.apply(variables, x)
    probs = [np.asarray(jax.nn.softmax(l, -1)) for l in out["hier_logits"]]
    decoded = greedy_decode(tree, probs)
    assert [d["result"]["label"] for d in decoded] == labels
    assert decoded[0]["result"]["prob_list"][0] == 1.0

    # inference helper wraps decode
    ret = clf.inference(variables, x)
    assert [d["result"]["label"] for d in ret["pred_hier_tags"]] == labels


def test_hier_label_encoder_tree_mode():
    cls = registry.get_processor_class("hier_label_encoder")
    proc = cls({"hier_label_schema": SCHEMA, "separator": "/"})
    out = proc({"label": "fashion/health/sports"})
    assert out["hier_label"].tolist() == [1, 2, 0]
    assert out["hier_param"].tolist() == [0, 1, 2]
    # legacy levels mode unchanged
    proc2 = cls({"levels": [["a", "b"], ["c"]]})
    assert proc2({"label": "b/c"})["hier_label"] == [1, 0]
