"""Minimal anytree stand-in so the *reference* greenhouse can run inside the
test suite for statistical parity checks (anytree is not installed here).
Implements only what vessel_graph_generation uses: NodeMixin with
parent/children/is_root/is_leaf plus attach/detach hooks, LevelOrderIter and
RenderTree."""
from __future__ import annotations

import sys
import types
from collections import deque


class NodeMixin:
    @property
    def parent(self):
        return getattr(self, "_parent", None)

    @parent.setter
    def parent(self, value):
        old = getattr(self, "_parent", None)
        if old is not None:
            old._children.remove(self)
            post = getattr(self, "_post_detach", None)
            if post:
                post(old)
        self._parent = value
        if value is not None:
            if not hasattr(value, "_children"):
                value._children = []
            value._children.append(self)
            post = getattr(self, "_post_attach", None)
            if post:
                post(value)

    @property
    def children(self):
        return tuple(getattr(self, "_children", ()))

    @property
    def is_root(self):
        return getattr(self, "_parent", None) is None

    @property
    def is_leaf(self):
        return len(getattr(self, "_children", ())) == 0


def LevelOrderIter(root, filter_=None):
    q = deque([root])
    while q:
        node = q.popleft()
        if filter_ is None or filter_(node):
            yield node
        q.extend(node.children)


def RenderTree(root):
    return f"<tree rooted at {root!r}>"


def install():
    mod = types.ModuleType("anytree")
    mod.NodeMixin = NodeMixin
    mod.LevelOrderIter = LevelOrderIter
    mod.RenderTree = RenderTree
    sys.modules.setdefault("anytree", mod)
