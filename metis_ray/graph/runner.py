"""Superstep harness: actor fleet + epoch loop + checkpoint/lineage/resume.

Lifecycle (SURVEY.md section 3.4):

    shards  = [CSRShardActor(pid, P, graph_dir) for pid in range(P)]
    (one-time) dst-position exchange between shards
    loop epoch k:
        scatter: every shard pre-combines its out-contributions per target
        gather:  payload refs routed shard->shard through the object store
        apply:   each shard folds incoming into its state, reports delta
        checkpoint every `checkpoint_every` epochs (atomic per-part parquet
        + manifest row with per-partition lineage: pid, epoch, rows, bytes,
        shuffle stats) — the reference's idempotent-import contract
        (Metis/tools/HDF5Helper.py:53-69) at epoch granularity
        converge on L1 delta / zero-changes (the MRR end-of-stream analogue)

Resume: ``resume_epoch`` scans the checkpoint manifest for the newest
complete epoch; shards reload their part files and the loop continues from
there — re-running a completed job is a no-op that just returns the stored
result (FIXTURES.md F5).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray

from metis_ray.graph.partition import graph_meta
from metis_ray.graph.shard import CSRShardActor


@dataclass
class RunStats:
    algorithm: str
    epochs: int = 0
    converged: bool = False
    supersteps_per_sec: float = 0.0
    edges_per_sec: float = 0.0
    total_edges: int = 0
    total_vertices: int = 0
    seconds: float = 0.0
    lineage: list = field(default_factory=list)
    resumed_from: int | None = None


class GraphRunner:
    """Owns the shard actor fleet for one partitioned graph directory."""

    def __init__(self, graph_dir: str, *, num_cpus_per_shard: float = 1.0) -> None:
        meta = graph_meta(graph_dir)
        self.P = meta["P"]
        self.graph_dir = graph_dir
        self.shards = [
            CSRShardActor.options(num_cpus=num_cpus_per_shard).remote(
                pid, self.P, graph_dir)
            for pid in range(self.P)
        ]
        metas = ray.get([s.meta.remote() for s in self.shards])
        self.n_total = int(sum(m["n"] for m in metas))
        self.m_total = int(sum(m["m"] for m in metas))
        self._exchange_positions()

    def _exchange_positions(self) -> None:
        """One-time resolution of destination positions: shard j asks owner t
        for the positions of its unique dsts. Data flows actor->actor through
        the object store (refs only on the driver)."""
        P = self.P
        q = [[self.shards[j].queries_for.remote(t) for t in range(P)]
             for j in range(P)]
        a = [[self.shards[t].answer_positions.remote(q[j][t]) for t in range(P)]
             for j in range(P)]
        metas = ray.get([s.meta.remote() for s in self.shards])
        installs = []
        for j in range(P):
            for t in range(P):
                installs.append(self.shards[j].install_positions.remote(
                    t, q[j][t], a[j][t], metas[t]["n"]))
        ray.get(installs)

    # ------------------------------------------------------------------
    def _superstep_loop(self, *, scatter: str, apply: str, apply_extra,
                        delta_done, max_iter: int, value_name: str,
                        ckpt_dir: str | None, checkpoint_every: int,
                        start_epoch: int, stats: RunStats) -> None:
        shards = self.shards
        t0 = time.perf_counter()
        for epoch in range(start_epoch, max_iter):
            te = time.perf_counter()
            # payload refs are routed to the target shards WITHOUT being
            # fetched to the driver: only floats/ints cross the driver.
            payloads = [getattr(s, scatter).remote() for s in shards]
            if scatter == "pagerank_scatter":
                dangle = float(sum(ray.get(
                    [s.dangling_mass.remote() for s in shards])))
                extra = apply_extra(dangle)
            else:
                extra = apply_extra(None)
            arefs = [getattr(s, apply).remote(payloads, *extra) for s in shards]
            deltas = ray.get(arefs)
            stats.epochs = epoch + 1
            se_secs = time.perf_counter() - te
            if ckpt_dir and ((epoch + 1) % checkpoint_every == 0 or
                             delta_done(deltas)):
                self._checkpoint(ckpt_dir, epoch + 1, value_name, se_secs, stats)
            if delta_done(deltas):
                stats.converged = True
                break
        stats.seconds = time.perf_counter() - t0
        done_epochs = stats.epochs - start_epoch
        if stats.seconds > 0 and done_epochs > 0:
            stats.supersteps_per_sec = done_epochs / stats.seconds
            stats.edges_per_sec = done_epochs * self.m_total / stats.seconds
        stats.total_edges = self.m_total
        stats.total_vertices = self.n_total

    def _checkpoint(self, ckpt_dir: str, epoch: int, value_name: str,
                    se_secs: float, stats: RunStats) -> None:
        rows = ray.get([s.save_checkpoint.remote(ckpt_dir, epoch, value_name)
                        for s in self.shards])
        for r in rows:
            r["superstep_seconds"] = se_secs
        stats.lineage.extend(rows)
        man = {"epoch": epoch, "value": value_name, "P": self.P,
               "complete": True, "parts": rows}
        tmp = os.path.join(ckpt_dir, f"manifest-{epoch}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(man, fh)
        os.replace(tmp, os.path.join(ckpt_dir, f"manifest-{epoch}.json"))

    @staticmethod
    def resume_epoch(ckpt_dir: str | None) -> int | None:
        """Newest complete checkpoint epoch in ckpt_dir, else None."""
        if not ckpt_dir or not os.path.isdir(ckpt_dir):
            return None
        best = None
        for f in os.listdir(ckpt_dir):
            if f.startswith("manifest-") and f.endswith(".json"):
                with open(os.path.join(ckpt_dir, f)) as fh:
                    m = json.load(fh)
                if m.get("complete"):
                    best = max(best or 0, m["epoch"])
        return best

    # ------------------------------------------------------------------
    def pagerank(self, *, alpha: float = 0.85, tol: float = 1e-9,
                 max_iter: int = 200, ckpt_dir: str | None = None,
                 checkpoint_every: int = 10, resume: bool = False) -> RunStats:
        """NetworkX-formulation PageRank: converges when the global L1 delta
        < N*tol (nx.pagerank's exact stopping rule)."""
        stats = RunStats("pagerank")
        start = 0
        re = self.resume_epoch(ckpt_dir) if resume else None
        if re is not None:
            ray.get([s.load_checkpoint.remote(ckpt_dir, re, "rank")
                     for s in self.shards])
            start = re
            stats.resumed_from = re
        else:
            ray.get([s.pagerank_init.remote(self.n_total) for s in self.shards])
        n = self.n_total
        self._superstep_loop(
            scatter="pagerank_scatter", apply="pagerank_apply",
            apply_extra=lambda dangle: (dangle, alpha, n),
            delta_done=lambda deltas: sum(deltas) < n * tol,
            max_iter=max_iter, value_name="rank", ckpt_dir=ckpt_dir,
            checkpoint_every=checkpoint_every, start_epoch=start, stats=stats)
        return stats

    def connected_components(self, *, max_iter: int = 200,
                             ckpt_dir: str | None = None,
                             checkpoint_every: int = 10,
                             resume: bool = False) -> RunStats:
        """Iterative min-label propagation over the symmetrized graph;
        fixpoint (0 changes) = exact connected components, component id =
        min vertex id in the component."""
        stats = RunStats("connected_components")
        start = 0
        re = self.resume_epoch(ckpt_dir) if resume else None
        if re is not None:
            ray.get([s.load_checkpoint.remote(ckpt_dir, re, "label")
                     for s in self.shards])
            start = re
            stats.resumed_from = re
        else:
            ray.get([s.labels_init.remote() for s in self.shards])
        self._superstep_loop(
            scatter="minlabel_scatter", apply="minlabel_apply",
            apply_extra=lambda _: (),
            delta_done=lambda ch: sum(ch) == 0,
            max_iter=max_iter, value_name="label", ckpt_dir=ckpt_dir,
            checkpoint_every=checkpoint_every, start_epoch=start, stats=stats)
        return stats

    def label_propagation(self, *, max_iter: int = 20,
                          ckpt_dir: str | None = None,
                          checkpoint_every: int = 5,
                          resume: bool = False) -> RunStats:
        """Deterministic synchronous label propagation over the symmetrized
        graph. Semantics (mirrored exactly by the test oracle): labels start
        as vertex ids; each round every vertex adopts the most frequent label
        among its neighbors' current labels (neighbor multiset from the
        deduped undirected edge set), ties broken by the smallest label;
        isolated vertices keep their label. Stops at a fixpoint or after
        ``max_iter`` rounds. (NetworkX's LPA variants are randomized; a
        seeded deterministic specification is required for a distributed
        engine to be testable — SURVEY.md section 5.2.)"""
        stats = RunStats("label_propagation")
        start = 0
        re = self.resume_epoch(ckpt_dir) if resume else None
        if re is not None:
            ray.get([s.load_checkpoint.remote(ckpt_dir, re, "label")
                     for s in self.shards])
            start = re
            stats.resumed_from = re
        else:
            ray.get([s.labels_init.remote() for s in self.shards])
        self._superstep_loop(
            scatter="lpa_scatter", apply="lpa_apply",
            apply_extra=lambda _: (),
            delta_done=lambda ch: sum(ch) == 0,
            max_iter=max_iter, value_name="label", ckpt_dir=ckpt_dir,
            checkpoint_every=checkpoint_every, start_epoch=start, stats=stats)
        return stats

    # ------------------------------------------------------------------
    def collect(self, value_name: str) -> pa.Table:
        """Gather the per-vertex result as one Arrow table (small outputs /
        tests; at scale use ``write_result`` instead)."""
        parts = ray.get([s.state_table.remote(value_name) for s in self.shards])
        return pa.concat_tables(parts)

    def write_result(self, out_dir: str, value_name: str) -> None:
        """Streaming result sink: one parquet file per partition."""
        ray.get([s.save_checkpoint.remote(out_dir, 0, value_name)
                 for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
