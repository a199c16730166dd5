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


def _table_algorithms() -> dict:
    """The shard-engine tail: callables ``(runner, **kwargs) ->
    (pa.Table, epochs)`` (or a result dict for hyperball/diameter) —
    lazily imported so the registry costs nothing until used."""
    from metis_ray.graph import algos
    return {
        "hits": algos.hits_shard,
        "bfs": algos.bfs_shard,                    # (runner, seeds, ...)
        "kcore": algos.kcore_shard,
        "scc": algos.scc_shard,
        "mis": algos.mis_shard,
        "hyperball": algos.hyperball_shard,        # -> dict
        "betweenness": algos.betweenness_shard,
        "edge_betweenness": algos.edge_betweenness_shard,
        "sssp": algos.sssp_shard,                  # (runner, seeds, ...)
        "eigenvector": algos.eigenvector_shard,
        "katz": algos.katz_shard,
        "coloring": algos.coloring_shard,
        "harmonic": algos.harmonic_shard,
        "closeness": algos.closeness_shard,
        "topo": algos.topo_shard,
        "diameter": algos.double_sweep_diameter,   # -> dict
    }


def run_table_algorithm(name: str, graph_dir: str, *args, **kwargs):
    """Run a shard-engine tail algorithm on a partitioned graph dir;
    returns whatever the algorithm returns (usually (table, epochs))."""
    from metis_ray.graph.runner import GraphRunner

    table_algos = _table_algorithms()
    if name not in table_algos:
        raise KeyError(
            f"unknown algorithm {name!r}; have {sorted(table_algos)}")
    runner = GraphRunner(graph_dir)
    try:
        return table_algos[name](runner, *args, **kwargs)
    finally:
        runner.shutdown()


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
