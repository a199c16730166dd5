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

# Epochs kept in flight in fixed-iteration mode. Measured on a single
# 32-core node: 1 (epoch-synchronous, no driver barrier between scatter and
# apply) beats 2 (overlap doubles live payload bytes and competes for the
# same cores) and unbounded floods the object store into spilling. On a real
# multi-node cluster where network transfer idles CPUs, 2 may win — re-measure.
_ASYNC_WINDOW = 1


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
    recoveries: int = 0


class GraphRunner:
    """Owns the shard actor fleet for one partitioned graph directory.

    Fault contract (the reference's ``Restart=always``,
    ``Metis/systemd/metis.service:8-9``): shard actors are created with
    ``max_restarts`` so Ray revives a dead shard with the same (pid, P,
    graph_dir) args — ``__init__`` reloads the persisted layout, cheap.
    The epoch loop catches the resulting actor errors, re-runs the one-time
    position exchange, reloads the newest complete checkpoint on EVERY shard
    (survivors may have advanced past it) and continues from there."""

    def __init__(self, graph_dir: str, *, num_cpus_per_shard: float = 1.0,
                 max_restarts: int = 4, max_recoveries: int = 3) -> None:
        meta = graph_meta(graph_dir)
        self.P = meta["P"]
        self.graph_dir = graph_dir
        self.max_recoveries = max_recoveries
        # P is fixed by the on-disk layout; on a cluster with fewer CPUs the
        # reservation is shrunk (fractional num_cpus) instead of letting
        # surplus actors pend forever — the constructor would otherwise hang
        # in ray.get with no diagnostic
        cpus = ray.cluster_resources().get("CPU", 1)
        if self.P * num_cpus_per_shard > cpus:
            num_cpus_per_shard = max(0.01, (cpus - 0.5) / self.P)
        self.shards = [
            CSRShardActor.options(num_cpus=num_cpus_per_shard,
                                  max_restarts=max_restarts).remote(
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
                # target t caches j's static layout; j's later payloads to t
                # are values-only vectors aligned to it
                installs.append(self.shards[t].store_incoming_layout.remote(
                    j, a[j][t]))
        ray.get(installs)

    # ------------------------------------------------------------------
    def _superstep_loop(self, *, scatter: str, apply: str, apply_extra,
                        delta_done, max_iter: int, value_name: str,
                        ckpt_dir: str | None, checkpoint_every: int,
                        start_epoch: int, stats: RunStats,
                        on_epoch=None, reinit=None, scatter_args=()) -> None:
        """Retry shell around the epoch loop: a dead shard actor (Ray
        restarts it per ``max_restarts``) surfaces as RayActorError — either
        directly (a call on the dead actor) or wrapped in RayTaskError (a
        peer's apply fetched the dead shard's payload ref). Recover and
        continue; anything else propagates."""
        t0 = time.perf_counter()
        start = start_epoch
        attempts = 0
        executed = 0            # epochs actually run, across ALL attempts —
        #                         wall time covers them too, so throughput
        #                         divides by this, not the final pass alone
        while True:
            try:
                self._run_epochs(
                    scatter=scatter, apply=apply, apply_extra=apply_extra,
                    delta_done=delta_done, max_iter=max_iter,
                    value_name=value_name, ckpt_dir=ckpt_dir,
                    checkpoint_every=checkpoint_every, start_epoch=start,
                    stats=stats, on_epoch=on_epoch, scatter_args=scatter_args)
                executed += max(0, stats.epochs - start)
                break
            except (ray.exceptions.RayActorError,
                    ray.exceptions.RayTaskError) as e:
                if (isinstance(e, ray.exceptions.RayTaskError)
                        and not isinstance(getattr(e, "cause", None),
                                           ray.exceptions.RayActorError)):
                    raise               # a real task bug, not a dead actor
                attempts += 1
                if reinit is None or attempts > self.max_recoveries:
                    raise
                executed += max(0, stats.epochs - start)   # lost progress
                start = self._recover(ckpt_dir, value_name, reinit)
                stats.recoveries = attempts
        stats.seconds = time.perf_counter() - t0
        if stats.seconds > 0 and executed > 0:
            stats.supersteps_per_sec = executed / stats.seconds
            stats.edges_per_sec = executed * self.m_total / stats.seconds
        stats.total_edges = self.m_total
        stats.total_vertices = self.n_total

    def _recover(self, ckpt_dir: str | None, value_name: str, reinit) -> int:
        """Rebuild after an actor death: wait for the restarted fleet (its
        ``__init__`` reloads the persisted layout), redo the one-time
        position exchange, then restore the newest complete checkpoint on
        ALL shards — or re-init from epoch 0 when there is none. Returns the
        epoch to continue from."""
        ray.get([s.meta.remote() for s in self.shards])  # blocks on restart
        self._exchange_positions()
        # reinit first (restores algorithm config — e.g. payload dtype — on
        # the restarted actor), then overlay checkpointed values if any.
        reinit()
        # only checkpoints written/loaded by THIS run count — a stale
        # manifest from an earlier run in the same ckpt_dir could otherwise
        # fast-forward the job past its actual progress
        re = self._run_ckpt_epoch
        if re is not None and ckpt_dir:
            ray.get([s.load_checkpoint.remote(ckpt_dir, re, value_name)
                     for s in self.shards])
            return re
        return 0

    def _run_epochs(self, *, scatter: str, apply: str, apply_extra,
                    delta_done, max_iter: int, value_name: str,
                    ckpt_dir: str | None, checkpoint_every: int,
                    start_epoch: int, stats: RunStats,
                    on_epoch=None, scatter_args=()) -> None:
        shards = self.shards
        sync = delta_done is not None
        arefs: list = []
        inflight: list[list] = []   # bounded async window (see below)
        for epoch in range(start_epoch, max_iter):
            te = time.perf_counter()
            # payload refs are routed to the target shards WITHOUT being
            # fetched to the driver: only floats/ints cross the driver.
            if scatter == "pagerank_scatter":
                # num_returns=2 splits (payload, dangling) into separate
                # refs; the dangling refs flow straight into apply, so the
                # driver never blocks between scatter and apply. In
                # fixed-iteration mode (delta_done=None, the bench path) the
                # driver submits EVERY superstep without a single blocking
                # get — actor task ordering + ref dataflow enforce the
                # epoch sequence — and syncs once at the end.
                pairs = [s.pagerank_scatter.options(num_returns=2).remote()
                         for s in shards]
                # the driver sums the P dangling floats (one tiny batched
                # get); shipping the refs instead would cost P^2 inner gets
                dangle = float(sum(ray.get([p[1] for p in pairs])))
                bundle = ray.put(([p[0] for p in pairs], dangle))
                extra = apply_extra(None)
            else:
                payloads = [getattr(s, scatter).remote(*scatter_args)
                            for s in shards]
                bundle = ray.put((payloads, []))
                extra = apply_extra(None)
            # one ray.put bundle instead of 2P ref args per apply call:
            # submission cost per superstep drops from O(P^2) to O(P)
            arefs = [getattr(s, apply).remote(bundle, *extra) for s in shards]
            stats.epochs = epoch + 1
            if not sync:
                # bounded pipelining: keep at most 2 epochs in flight so
                # scatter(k+1) overlaps apply(k) without the driver barrier,
                # but payload objects from older epochs are consumed (and
                # freed from the object store) before more are produced —
                # unbounded submission floods plasma and forces spilling.
                inflight.append((epoch + 1, arefs))
                if len(inflight) >= _ASYNC_WINDOW:
                    ep_done, refs = inflight.pop(0)
                    ray.get(refs)
                    # fixed-iteration mode checkpoints too — ckpt_dir with
                    # tol<=0 used to be silently ignored
                    if ckpt_dir and ep_done % checkpoint_every == 0:
                        # barrier first: with a window > 1, later epochs'
                        # apply tasks are already enqueued on the actors and
                        # would advance state under the checkpoint — drain
                        # them and label the checkpoint with the epoch the
                        # actor state actually holds
                        while inflight:
                            ep_done, refs = inflight.pop(0)
                            ray.get(refs)
                        self._checkpoint(ckpt_dir, ep_done, value_name,
                                         0.0, stats)
                continue
            deltas = ray.get(arefs)
            se_secs = time.perf_counter() - te
            if on_epoch is not None:
                # progress hook (the reference's update_progress callback,
                # stdf2ph5.py:70-71,370-372)
                on_epoch(epoch + 1, sum(deltas), se_secs)
            if ckpt_dir and ((epoch + 1) % checkpoint_every == 0 or
                             delta_done(deltas)):
                self._checkpoint(ckpt_dir, epoch + 1, value_name, se_secs, stats)
            if delta_done(deltas):
                stats.converged = True
                break
        for ep_done, refs in inflight:
            ray.get(refs)       # drain the pipeline
            if ckpt_dir and ep_done % checkpoint_every == 0:
                self._checkpoint(ckpt_dir, ep_done, value_name, 0.0, stats)

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
        self._run_ckpt_epoch = epoch    # recovery floor: this run's newest

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
                 checkpoint_every: int = 10, resume: bool = False,
                 payload_dtype: str = "float32", on_epoch=None,
                 weighted: bool = False,
                 personalization: dict[int, float] | None = None,
                 warm_dir: str | None = None,
                 warm_epoch: int = 0) -> RunStats:
        """NetworkX-formulation PageRank: converges when the global L1 delta
        < N*tol (nx.pagerank's exact stopping rule). ``payload_dtype``
        controls the scatter transport precision (see
        CSRShard.pagerank_scatter); accumulation is always float64.
        ``weighted``: contributions scale by edge weight / out-strength
        (needs a graph dir built with ``weight_col=``) — NetworkX
        ``pagerank(weight=...)``. ``personalization``: vertex -> weight
        teleport distribution (normalised here; the dangling mass follows
        it too) — NetworkX ``pagerank(personalization=...)``. The dict is
        seed-set-sized; each shard keeps only its own slice."""
        stats = RunStats("pagerank")
        start = 0

        pvec_ids = pvec_w = None
        if personalization is not None:
            pvec_ids = np.asarray(sorted(personalization), dtype=np.int64)
            pvec_w = np.asarray([personalization[int(k)] for k in pvec_ids],
                                dtype=np.float64)
            tot = float(pvec_w.sum())
            if tot <= 0:
                raise ValueError("personalization weights must sum > 0")
            pvec_w = pvec_w / tot

        def init() -> None:
            ray.get([s.pagerank_init.remote(
                self.n_total, payload_dtype, weighted=weighted,
                pvec_ids=pvec_ids, pvec_w=pvec_w) for s in self.shards])
            if pvec_ids is not None:
                placed = sum(ray.get([s.pvec_mass.remote()
                                      for s in self.shards]))
                if abs(placed - 1.0) > 1e-9:
                    raise ValueError(
                        "personalization key is not a graph vertex")

        re = self.resume_epoch(ckpt_dir) if resume else None
        self._run_ckpt_epoch = re
        if re is not None:
            ray.get([s.load_checkpoint.remote(ckpt_dir, re, "rank")
                     for s in self.shards])
            start = re
            stats.resumed_from = re
        else:
            init()
            if warm_dir is not None:
                # WARM START across graph growth: overlay a prior run's
                # per-pid (v, rank) checkpoint onto the fresh uniform
                # vector (pid = v % P is growth-stable, so each shard
                # reads only its own part file; vertices new since the
                # prior run keep 1/n), then renormalize globally. The
                # iteration itself is unchanged — warm start only moves
                # the starting point closer to the fixpoint.
                sums = ray.get([s.warm_from_checkpoint.remote(
                    warm_dir, warm_epoch) for s in self.shards])
                tot = float(sum(sums))
                if tot <= 0:
                    raise ValueError(f"warm checkpoint {warm_dir!r} "
                                     "holds no mass")
                ray.get([s.scale_values.remote(1.0 / tot)
                         for s in self.shards])
        n = self.n_total
        self._superstep_loop(
            scatter="pagerank_scatter", apply="pagerank_apply",
            apply_extra=lambda _: (alpha, n),
            # tol<=0 selects the async fixed-iteration pipeline (bench mode)
            delta_done=(None if tol <= 0
                        else (lambda deltas: sum(deltas) < n * tol)),
            max_iter=max_iter, value_name="rank", ckpt_dir=ckpt_dir,
            checkpoint_every=checkpoint_every, start_epoch=start, stats=stats,
            on_epoch=on_epoch, reinit=init)
        return stats

    def connected_components(self, *, max_iter: int = 200,
                             ckpt_dir: str | None = None,
                             checkpoint_every: int = 10,
                             resume: bool = False, on_epoch=None) -> RunStats:
        """Iterative min-label propagation over the symmetrized graph;
        fixpoint (0 changes) = exact connected components, component id =
        min vertex id in the component."""
        stats = RunStats("connected_components")
        start = 0

        def init() -> None:
            ray.get([s.labels_init.remote() for s in self.shards])

        re = self.resume_epoch(ckpt_dir) if resume else None
        self._run_ckpt_epoch = re
        if re is not None:
            ray.get([s.load_checkpoint.remote(ckpt_dir, re, "label")
                     for s in self.shards])
            start = re
            stats.resumed_from = re
        else:
            init()
        self._superstep_loop(
            scatter="minlabel_scatter", apply="minlabel_apply",
            apply_extra=lambda _: (),
            delta_done=lambda ch: sum(ch) == 0,
            max_iter=max_iter, value_name="label", ckpt_dir=ckpt_dir,
            checkpoint_every=checkpoint_every, start_epoch=start, stats=stats,
            on_epoch=on_epoch, reinit=init)
        return stats

    def label_propagation(self, *, max_iter: int = 20,
                          ckpt_dir: str | None = None,
                          checkpoint_every: int = 5,
                          resume: bool = False, on_epoch=None,
                          weighted: bool = False) -> RunStats:
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

        def init() -> None:
            ray.get([s.labels_init.remote() for s in self.shards])

        re = self.resume_epoch(ckpt_dir) if resume else None
        self._run_ckpt_epoch = re
        if re is not None:
            ray.get([s.load_checkpoint.remote(ckpt_dir, re, "label")
                     for s in self.shards])
            start = re
            stats.resumed_from = re
        else:
            init()
        self._superstep_loop(
            scatter="lpa_scatter", apply="lpa_apply",
            apply_extra=lambda _: (),
            delta_done=lambda ch: sum(ch) == 0,
            max_iter=max_iter, value_name="label", ckpt_dir=ckpt_dir,
            checkpoint_every=checkpoint_every, start_epoch=start, stats=stats,
            on_epoch=on_epoch, reinit=init, scatter_args=(weighted,))
        return stats

    # ------------------------------------------------------------------
    # generic superstep helpers for the shard-resident tail algorithms
    # (graph/algos.py): one push / pull / frequency exchange each, payload
    # refs routed shard->shard through the object store — only the update
    # closures' small summaries cross the driver.

    def apply_all(self, fn, *args) -> list:
        """Run a closure against every shard; returns the P small results."""
        return ray.get([s.apply_local.remote(fn, *args) for s in self.shards])

    def step_push(self, name: str, op: str, out: str, *, dtype="float64",
                  k: int = 0, mask: str | None = None, plus=0,
                  weighted: bool = False, drop_self: bool = False,
                  plus_weight: bool = False,
                  update=None, uargs=()) -> list:
        payloads = [s.val_scatter.remote(name, op, mask=mask, plus=plus,
                                         weighted=weighted,
                                         drop_self=drop_self,
                                         plus_weight=plus_weight)
                    for s in self.shards]
        bundle = ray.put((payloads, []))
        return ray.get([s.val_gather.remote(bundle, op, out, dtype=dtype,
                                            k=k, update=update, uargs=uargs)
                        for s in self.shards])

    def step_pull(self, name: str, op: str, out: str, *, dtype="float64",
                  k: int = 0, mask: str | None = None, mul: str | None = None,
                  weighted: bool = False, drop_self: bool = False,
                  update=None, uargs=()) -> list:
        payloads = [s.pull_serve.remote(name) for s in self.shards]
        bundle = ray.put((payloads, []))
        return ray.get([s.pull_gather.remote(
            bundle, op, out, dtype=dtype, k=k, mask=mask, mul=mul,
            weighted=weighted, drop_self=drop_self, update=update,
            uargs=uargs) for s in self.shards])

    def step_freq(self, name: str, update, *, weighted: bool = False,
                  drop_self: bool = False, uargs=()) -> list:
        payloads = [s.freq_scatter.remote(name, weighted=weighted,
                                          drop_self=drop_self)
                    for s in self.shards]
        bundle = ray.put((payloads, []))
        return ray.get([s.freq_gather.remote(bundle, update, uargs)
                        for s in self.shards])

    def collect_vals(self, cols: dict[str, str]) -> pa.Table:
        """Gather named per-vertex vals as one Arrow table (small outputs /
        tests; at scale write per-shard parquet instead)."""
        parts = ray.get([s.val_table.remote(cols) for s in self.shards])
        return pa.concat_tables(parts)

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
