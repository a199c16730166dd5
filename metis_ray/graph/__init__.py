"""Graph engine package + the algorithm registry (extension surface).

The reference registers its processing elements by name for discovery
(``__gstelementfactory__`` / GObject registration,
``metis_source.py:235-236``); Metis-Ray's equivalent is this registry:
each algorithm is addressable by name and new ones plug in by adding an
entry (a callable ``(runner, **kwargs) -> RunStats``).
"""

from __future__ import annotations

ALGORITHMS = {
    "pagerank": lambda runner, **kw: runner.pagerank(**kw),
    "components": lambda runner, **kw: runner.connected_components(**kw),
    "labelprop": lambda runner, **kw: runner.label_propagation(**kw),
}

# which graph orientation each algorithm needs at build time
ALGORITHM_DIRECTED = {"pagerank": True, "components": False, "labelprop": False}


def run_algorithm(name: str, graph_dir: str, **kwargs):
    """Run a registered algorithm on a partitioned graph dir; returns
    (RunStats, result Arrow table)."""
    from metis_ray.graph.runner import GraphRunner

    if name not in ALGORITHMS:
        raise KeyError(f"unknown algorithm {name!r}; have {sorted(ALGORITHMS)}")
    runner = GraphRunner(graph_dir)
    try:
        stats = ALGORITHMS[name](runner, **kwargs)
        value = "rank" if name == "pagerank" else "label"
        return stats, runner.collect(value)
    finally:
        runner.shutdown()
