"""PPI graph tools: GraphStringDb, GenePrioritization.

Behavioral reference: ngs-bits src/GraphStringDb/{main.cpp,StringDbParser.h}
and src/GenePrioritization/main.cpp (flooding network diffusion /
random-walk-with-restart over an undirected PPI graph).
"""

from __future__ import annotations

import gzip
import math
import sys

import numpy as np

from ..core.graph import Graph
from .toolbase import ToolBase, ToolError


def _open_text(path: str):
    fh = open(path, "rb")
    if fh.read(2) == b"\x1f\x8b":
        fh.close()
        return gzip.open(path, "rb")
    fh.seek(0)
    return fh


class GraphStringDbTool(ToolBase):
    name = "GraphStringDb"
    description = "Creates simple representation of String-DB interaction graph."

    def setup(self):
        self.add_infile("string", "String-DB file with protein interactions (https://stringdb-static.org/download/protein.links.v11.5/9606.protein.links.v11.5.txt.gz).")
        self.add_infile("alias", "Input TSV file with aliases for String protein IDs (https://stringdb-static.org/download/protein.aliases.v11.5/9606.protein.aliases.v11.5.txt.gz).")
        self.add_outfile("out", "Output TSV file with edges.")
        self.add_float("min_score", "Minimum confidence score cutoff for String-DB interaction (0-1).", optional=True, default=0.4)

    def main(self):
        min_score = self.get_float("min_score")
        if not (0.0 <= min_score <= 1.0):
            raise ToolError("Threshold for interaction score should be between 0 and 1")
        threshold = int(round(min_score * 1000))

        # alias file: String protein id -> HGNC id (StringDbParser.h:90-118)
        hgnc: dict[str, str] = {}
        with _open_text(self.get_infile("alias")) as fh:
            first = True
            for raw in fh:
                if first:
                    first = False
                    continue
                parts = [p for p in raw.decode().rstrip("\r\n").split("\t") if p]
                if len(parts) == 3 and parts[2] == "Ensembl_HGNC_HGNC_ID" and parts[1].startswith("HGNC:"):
                    hgnc[parts[0]] = parts[1]

        graph = Graph()
        with _open_text(self.get_infile("string")) as fh:
            first = True
            for raw in fh:
                if first:
                    first = False
                    continue
                parts = [p for p in raw.decode().rstrip("\r\n").split(" ") if p]
                if len(parts) == 3:
                    try:
                        score = int(parts[2])
                    except ValueError:
                        score = 0
                    if parts[0] in hgnc and parts[1] in hgnc and score >= threshold:
                        graph.add_edge(hgnc[parts[0]], hgnc[parts[1]])
        graph.store(self.get_outfile("out"))


def _c_round6(x: float) -> float:
    """C round(x*1e6)/1e6 — half away from zero."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


class GenePrioritizationTool(ToolBase):
    name = "GenePrioritization"
    description = "Performs gene prioritization based on list of known disease genes of a disease and a PPI graph."

    def setup(self):
        self.add_infile("in", "Input TSV file with one gene identifier per line (known disease genes of a disease).")
        self.add_infile("graph", "Graph TSV file with two gene identifiers per line (PPI graph).")
        self.add_outfile("out", "Output TSV file containing prioritized genes for the disease.")
        self.add_enum("method", "Gene prioritization method to use.", optional=True,
                      valid=("flooding", "random_walk"), default="flooding")
        self.add_int("n", "Number of network diffusion iterations (flooding).", optional=True, default=2)
        self.add_float("restart", "Restart probability (random_walk).", optional=True, default=0.4)
        self.add_outfile("debug", "Output TSV file for debugging", optional=True)

    def main(self):
        graph = Graph()
        with open(self.get_infile("graph"), "rb") as fh:
            for raw in fh:
                parts = [p for p in raw.decode().rstrip("\r\n").split("\t") if p]
                if len(parts) == 2:
                    graph.add_edge(parts[0], parts[1])

        n_nodes = len(graph.names)
        scores = np.zeros(n_nodes, dtype=np.float64)
        starting: list[int] = []
        with open(self.get_infile("in"), "rb") as fh:
            for raw in fh:
                parts = [p for p in raw.decode().rstrip("\r\n").split("\t") if p]
                if parts and graph.has_node(parts[0]):
                    idx = graph.name2idx[parts[0]]
                    scores[idx] = 1.0
                    starting.append(idx)

        deg = graph.degrees()
        ea, eb = graph.edge_arrays()

        if self.get_enum("method") == "flooding":
            # GenePrioritization/main.cpp:180-250: each iteration propagates
            # score/degree along every incident edge, then adds the gathered
            # increments scaled by 1/sqrt(receiver degree)
            for _ in range(self.get_int("n")):
                with np.errstate(divide="ignore", invalid="ignore"):
                    contrib = scores / deg
                contrib = np.where(scores != 0.0, contrib, 0.0)
                change = np.zeros(n_nodes, dtype=np.float64)
                np.add.at(change, eb, contrib[ea])
                np.add.at(change, ea, contrib[eb])
                scores = scores + change / np.sqrt(deg)
        else:
            scores = self._random_walk(graph, scores, starting, deg)

        # writeOutputTsv: round to 6 decimals, sort by (score desc, name asc)
        rounded = [_c_round6(float(s)) for s in scores]
        is_start = set(starting)
        order = sorted(range(n_nodes), key=lambda i: (-rounded[i], graph.names[i]))
        lines = ["node\tscore\tstarting_node\tdegree"]
        for i in order:
            lines.append(f"{graph.names[i]}\t{rounded[i]:.6g}\t{1 if i in is_start else 0}\t{deg[i]}")
        out = self.get_outfile("out")
        text = "".join(l + "\n" for l in lines)
        with open(out, "w") as fh:
            fh.write(text)

    def _random_walk(self, graph: Graph, scores, starting, deg,
                     restart=None, max_steps=1_000_000):
        """Random walk with restart (main.cpp:252-330); RNG differs from the
        reference (std::default_random_engine is platform-specific — the
        reference test itself only checks rank correlation)."""
        if restart is None:
            restart = self.get_float("restart")
        if not starting:
            raise ToolError("No starting nodes found in graph")
        adj = graph.adjacency()
        rng = np.random.default_rng(0)
        visit = np.zeros(len(graph.names), dtype=np.int64)
        prev_prob = np.zeros(len(graph.names), dtype=np.float64)
        current = starting[int(rng.integers(0, len(starting)))]
        visit[current] += 1
        steps = 1
        update_frequency = 50_000
        vector_diff = 1.0
        while vector_diff > 1.0e-6 and steps < max_steps:
            # pre-draw a chunk of random numbers for speed
            chunk = min(update_frequency, max_steps - steps)
            restarts = rng.random(chunk) < restart
            picks = rng.random(chunk)
            for k in range(chunk):
                steps += 1
                if restarts[k]:
                    current = starting[int(picks[k] * len(starting))]
                else:
                    nbrs = adj[current]
                    current = nbrs[int(picks[k] * len(nbrs))]
                visit[current] += 1
                if steps % update_frequency == 0:
                    prob = visit / steps
                    vector_diff = float(np.abs(prob - prev_prob).sum()) / update_frequency
                    prev_prob = prob
                    break
        return visit / np.sqrt(deg)


TOOLS = {
    "GraphStringDb": GraphStringDbTool,
    "GenePrioritization": GenePrioritizationTool,
}
