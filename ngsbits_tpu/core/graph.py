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
