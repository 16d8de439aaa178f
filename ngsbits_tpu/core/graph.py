"""Undirected graph substrate (PPI networks).

Behavioral reference: ngs-bits cppNGS/Graph.h / GraphNode.h / GraphEdge.h —
nodes keyed by name, edge set kept in first-seen orientation, degree =
adjacency-list length (a self-loop counts twice), store() sorts edge pairs
lexicographically.
"""

from __future__ import annotations

import sys

import numpy as np


class Graph:
    def __init__(self):
        self.name2idx: dict[str, int] = {}
        self.names: list[str] = []
        self.edges: list[tuple[int, int]] = []  # first-seen orientation, unique
        self._edge_set: set[tuple[int, int]] = set()

    def _node(self, name: str) -> int:
        i = self.name2idx.get(name)
        if i is None:
            i = len(self.names)
            self.name2idx[name] = i
            self.names.append(name)
        return i

    def has_node(self, name: str) -> bool:
        return name in self.name2idx

    def add_edge(self, name1: str, name2: str) -> bool:
        a, b = self._node(name1), self._node(name2)
        if (a, b) in self._edge_set or (b, a) in self._edge_set:
            return False
        self._edge_set.add((a, b))
        self.edges.append((a, b))
        return True

    def degrees(self) -> np.ndarray:
        deg = np.zeros(len(self.names), dtype=np.int64)
        for a, b in self.edges:
            deg[a] += 1
            deg[b] += 1
        return deg

    def edge_arrays(self):
        if not self.edges:
            return (np.empty(0, dtype=np.int64),) * 2
        e = np.asarray(self.edges, dtype=np.int64)
        return e[:, 0], e[:, 1]

    def adjacency(self) -> list[list[int]]:
        adj: list[list[int]] = [[] for _ in self.names]
        for a, b in self.edges:
            adj[a].append(b)
            adj[b].append(a)
        return adj

    def store(self, filename: str | None):
        pairs = sorted((self.names[a], self.names[b]) for a, b in self.edges)
        text = "".join(f"{a}\t{b}\n" for a, b in pairs)
        if filename:
            with open(filename, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


class _TNode:
    __slots__ = ("name", "content")

    def __init__(self, name, content):
        self.name = name
        self.content = content

    def node_name(self):
        return self.name

    def node_content(self):
        return self.content


class _TEdge:
    __slots__ = ("node1", "node2", "content")

    def __init__(self, node1, node2, content):
        self.node1 = node1
        self.node2 = node2
        self.content = content

    def edge_content(self):
        return self.content


class TypedGraph:
    """Generic node/edge-content graph (cppNGS/Graph.h Graph<NodeType,
    EdgeType>): optional direction, addNode/addEdge overloads, degree and
    adjacency queries with ArgumentException analogues."""

    def __init__(self, directed: bool = False):
        self._directed = directed
        self._nodes: dict[str, _TNode] = {}
        self._adjacency: dict[str, list[_TEdge]] = {}

    def directed(self) -> bool:
        return self._directed

    def add_node(self, name: str, content, throw_if_exists: bool = True) -> bool:
        if name in self._nodes:
            if throw_if_exists:
                raise ValueError(f"Node '{name}' already contained in graph!")
            return False
        self._nodes[name] = _TNode(name, content)
        self._adjacency[name] = []
        return True

    def has_node(self, name: str) -> bool:
        return name in self._nodes

    def get_node(self, name: str) -> _TNode:
        if name not in self._nodes:
            raise ValueError(f"Node '{name}' not contained in graph!")
        return self._nodes[name]

    def add_edge(self, *args) -> bool:
        """addEdge(node1, node2, content) or
        addEdge(name1, content1, name2, content2, edge_content) — the latter
        creates missing nodes."""
        if len(args) == 3:
            node1, node2, content = args
        elif len(args) == 5:
            name1, c1, name2, c2, content = args
            if not self.has_node(name1):
                self.add_node(name1, c1)
            if not self.has_node(name2):
                self.add_node(name2, c2)
            node1, node2 = self._nodes[name1], self._nodes[name2]
        else:
            raise TypeError("add_edge takes 3 or 5 arguments")
        if self.has_edge(node1.name, node2.name):
            return False
        edge = _TEdge(node1, node2, content)
        self._adjacency[node1.name].append(edge)
        if not self._directed:
            self._adjacency[node2.name].append(edge)
        elif node1.name == node2.name:
            pass
        return True

    def has_edge(self, name1: str, name2: str) -> bool:
        if name1 not in self._nodes or name2 not in self._nodes:
            return False
        for e in self._adjacency[name1]:
            if self._directed:
                if e.node1.name == name1 and e.node2.name == name2:
                    return True
            else:
                if {e.node1.name, e.node2.name} == {name1, name2} or \
                        (name1 == name2 and e.node1.name == name1
                         and e.node2.name == name1):
                    return True
        return False

    def get_edge(self, name1: str, name2: str) -> _TEdge:
        if name1 not in self._nodes or name2 not in self._nodes:
            raise ValueError("Node not contained in graph!")
        for e in self._adjacency[name1]:
            if self._directed:
                if e.node1.name == name1 and e.node2.name == name2:
                    return e
            else:
                if {e.node1.name, e.node2.name} == {name1, name2}:
                    return e
        raise ValueError(f"No edge between '{name1}' and '{name2}'!")

    def is_adjacent(self, name1: str, name2: str) -> bool:
        if name1 not in self._nodes or name2 not in self._nodes:
            raise ValueError("Node not contained in graph!")
        return self.has_edge(name1, name2)

    def get_degree(self, name: str) -> int:
        if name not in self._nodes:
            raise ValueError(f"Node '{name}' not contained in graph!")
        return len(self._adjacency[name])
