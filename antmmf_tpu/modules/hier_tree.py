"""Hierarchical label tree for hierarchical-softmax classification.

Reference parity: ``/root/reference/antmmf/modules/utils.py:158-460``
(``TreeNode``, ``build_hier_tree``) + the tree surface consumed by
``decoders/hierarchical_classifier.py``. Each internal node's children form
one softmax *group*; a label path "a-b" encodes as, per group, the child
index taken at that group (−1 where the path doesn't visit the group).

TPU deltas: the tree is host-side metadata only (the model sees static
group sizes and integer-encoded paths, so the jitted step never touches
tree objects), and tree state is instance-scoped — the reference keeps
``ALL_LABELS``/``ParamGroup`` as class attributes, which leaks between
trees; here two trees never interact and ``build_hier_tree`` is pure
rather than a process-global singleton.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

HIER_CLASS_SEP = "-"


class TreeNode:
    def __init__(self, label_name: Optional[str] = None, label_idx: int = -1):
        self.parent: Optional["TreeNode"] = None
        self.children: List["TreeNode"] = []
        self.parent_child_idx = -1
        self.label_name = label_name
        self.label_idx = label_idx  # -1 indicates root
        self.group_id = -1  # softmax group this node's CHILDREN belong to

    def add_child(self, node: "TreeNode") -> None:
        node.parent = self
        node.parent_child_idx = len(self.children)
        self.children.append(node)

    def is_leaf(self) -> bool:
        return not self.children

    def __repr__(self) -> str:
        return (f"node[idx={self.label_idx}, name={self.label_name}, "
                f"group_id={self.group_id}]")


class HierTree(TreeNode):
    """Root node + the group/label bookkeeping (ref TreeNode class state)."""

    def __init__(self) -> None:
        super().__init__(label_name=None, label_idx=-1)
        self.all_labels: List[str] = []
        self.param_groups: List[Dict[str, Any]] = []

    # ------------------------------------------------------------- building
    def _new_node(self, name: str) -> TreeNode:
        if name not in self.all_labels:
            self.all_labels.append(name)
        return TreeNode(name, self.all_labels.index(name))

    def _add_schema(self, parent: TreeNode, schema: Sequence) -> None:
        for entry in schema:
            if isinstance(entry, str):
                parent.add_child(self._new_node(entry))
            else:  # single-pair mapping {name: sub_schema}
                entry = dict(entry)
                assert len(entry) == 1, f"ambiguous schema entry: {entry}"
                (name, sub), = entry.items()
                node = self._new_node(name)
                parent.add_child(node)
                self._add_schema(node, sub)

    def _assign_groups(self) -> None:
        """BFS: every internal node's children = one softmax group."""
        self.param_groups = []
        queue: List[TreeNode] = [self]
        while queue:
            node = queue.pop(0)
            if node.children:
                node.group_id = len(self.param_groups)
                self.param_groups.append(
                    {"group_id": node.group_id,
                     "num_outputs": len(node.children),
                     "parent_label": node.label_name})
                queue.extend(node.children)

    # ------------------------------------------------------------- queries
    def traverse(self) -> Iterator[TreeNode]:
        stack: List[TreeNode] = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def get_depth(self) -> int:
        def depth(node: TreeNode) -> int:
            return 1 + max((depth(c) for c in node.children), default=0)

        return depth(self) - 1  # root does not count

    def search_node(self, attr: str, val) -> Optional[TreeNode]:
        for node in self.traverse():
            if getattr(node, attr, None) == val:
                return node
        return None

    def get_node_from_label_str(self, label_str: str) -> TreeNode:
        node: TreeNode = self
        for name in label_str.split(HIER_CLASS_SEP):
            for child in node.children:
                if child.label_name == name:
                    node = child
                    break
            else:
                raise KeyError(f"label {label_str!r}: {name!r} not a child "
                               f"of {node.label_name!r}")
        return node

    def get_node_info(self, node: TreeNode
                      ) -> Tuple[List[int], List[int], str]:
        """(child indices root→node, group ids used, 'a-b' label string) —
        reference get_node_info (modules/utils.py:185-203)."""
        child_idx, groups, names = [], [], []
        cur: Optional[TreeNode] = node
        while cur is not None and cur.parent is not None:
            child_idx.append(cur.parent_child_idx)
            groups.append(cur.parent.group_id)
            names.append(cur.label_name)
            cur = cur.parent
        return (child_idx[::-1], groups[::-1],
                HIER_CLASS_SEP.join(names[::-1]))

    # ------------------------------------------------------------- encoding
    def encode_label_str(self, label_str: str, mask_padding: int = -1
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """'a-b' → (hier_label int[G], hier_param int[G]) padded with
        mask_padding (reference modules/utils.py:208-234). G = number of
        softmax groups; entry l is the child index taken at path level l
        and the group that softmax runs in."""
        node = self.get_node_from_label_str(label_str)
        G = len(self.param_groups)
        hier_label = np.full((G,), mask_padding, np.int64)
        hier_param = np.full((G,), mask_padding, np.int64)
        child_idx, groups, _ = self.get_node_info(node)
        hier_label[: len(child_idx)] = child_idx
        hier_param[: len(groups)] = groups
        return hier_label, hier_param


def build_tree_from_file(path: str) -> HierTree:
    """One full hier label per line ('a-b'); shared prefixes merge
    (reference TreeNode.build_tree_from_file)."""
    tree = HierTree()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            node: TreeNode = tree
            for name in line.split(HIER_CLASS_SEP):
                for child in node.children:
                    if child.label_name == name:
                        node = child
                        break
                else:
                    new = tree._new_node(name)
                    node.add_child(new)
                    node = new
    tree._assign_groups()
    return tree


def build_hier_tree(label_schema) -> HierTree:
    """Schema → tree (reference modules/utils.py:447-460, minus the
    singleton). str = schema file path; list/tuple = nested schema like
    ['a', {'b': ['c', 'd']}]."""
    if isinstance(label_schema, str):
        return build_tree_from_file(label_schema)
    if isinstance(label_schema, (list, tuple)):
        tree = HierTree()
        tree._add_schema(tree, label_schema)
        tree._assign_groups()
        return tree
    raise ValueError(f"unknown hier_label_schema input: {label_schema!r}")


def greedy_decode(tree: HierTree, hier_probs: Sequence[np.ndarray]
                  ) -> List[Dict[str, Any]]:
    """Walk the max-prob child at each group (reference
    hierarchical_classifier.py:154-209). ``hier_probs``: one [B, n_g] array
    per group. Returns the reference's result-dict shape."""
    B = hier_probs[0].shape[0]
    out = []
    for b in range(B):
        node: TreeNode = tree
        prob = 1.0
        prob_list = [1.0]
        while not node.is_leaf():
            probs = np.asarray(hier_probs[node.group_id][b])
            k = int(np.argmax(probs))
            prob *= float(probs[k])
            prob_list.append(round(prob, 4))
            node = node.children[k]
        _, _, label_str = tree.get_node_info(node)
        out.append({"result": {"prob": prob, "label": label_str,
                               "prob_list": prob_list}, "detail": []})
    return out
