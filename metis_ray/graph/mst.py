"""Distributed minimum spanning forest via Boruvka supersteps.

Classic link-graph operator (Boruvka 1926; the GBBS / Spark-GraphX MSF
shape): every component picks its lightest outgoing edge, the picked
edges merge components, repeat — O(log V) rounds, each one a constant
number of hash joins + one combiner-backed groupby over the edge table.

Determinism under ties: edges are compared by the STRICT total order
(weight, src, dst) over canonical (src < dst) distinct pairs. A total
tie-break order makes the minimum spanning forest unique, and every MST
algorithm that respects the order returns the same edge set — so the
distributed Boruvka here and the sequential Kruskal in
``mst_reference`` are provably identical on ANY input, ties included
(that equality is the pytest + golden-twin oracle).

Scale shape (the 100 TB contract): NO per-vertex state on the driver —
the (v, label) table is a Dataset joined against the edge table each
round; per-component lightest-edge selection is a per-batch lexmin
combiner followed by one groupby(comp) shuffle (rows after the combiner
<= components-per-batch, not edges); the component-merge step is
pointer-jumping over the picked-edge table (<= one row per component,
halving every round) as Dataset self-joins. The driver sees only row
counts. Parallel edges collapse to their minimum weight at the
canonicalization groupby; self-loops drop.

Reference analogue: the reference engine has no graph algorithms at all
(SURVEY.md §2 — its "graph" is the per-lot record hierarchy); MSF is
part of the beyond-the-reference link-graph family (SURVEY.md §2.10
extension surface) next to k-truss / betweenness / HyperBall.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Min


def _canonical_weighted(edges: rd.Dataset,
                        weight_col: str | None) -> rd.Dataset:
    """Distinct undirected (src < dst) pairs with the MIN weight over all
    parallel rows in either orientation; self-loops dropped. Weight 1.0
    when ``weight_col`` is None (the unweighted forest = BFS-ish)."""

    def canon(batch: pa.Table, _w=weight_col) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        w = (batch[_w].to_numpy(zero_copy_only=False).astype(np.float64)
             if _w else np.ones(len(a), np.float64))
        keep = a != b
        a, b, w = a[keep], b[keep], w[keep]
        t = pa.table({"src": pa.array(np.minimum(a, b), pa.int64()),
                      "dst": pa.array(np.maximum(a, b), pa.int64()),
                      "weight": pa.array(w, pa.float64())})
        g = t.group_by(["src", "dst"]).aggregate([("weight", "min")])
        return g.rename_columns(["src", "dst", "weight"])

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    return (edges.select_columns(cols)
            .map_batches(canon, batch_format="pyarrow")
            .groupby(["src", "dst"])
            .aggregate(Min("weight", alias_name="weight")))


def _lexmin_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: the (weight, src, dst)-lexmin candidate row per
    component key already present in the batch."""
    if batch.num_rows == 0 or "comp" not in batch.column_names:
        return pa.table({"comp": pa.array([], pa.int64()),
                         "weight": pa.array([], pa.float64()),
                         "src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "la": pa.array([], pa.int64()),
                         "lb": pa.array([], pa.int64())})
    c = batch["comp"].to_numpy(zero_copy_only=False)
    w = batch["weight"].to_numpy(zero_copy_only=False)
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, s, w, c))        # comp asc, then (w, src, dst)
    first = np.empty(len(order), bool)
    cs = c[order]
    first[0] = True
    first[1:] = cs[1:] != cs[:-1]
    pick = order[first]
    return pa.table({
        "comp": pa.array(c[pick], pa.int64()),
        "weight": pa.array(w[pick], pa.float64()),
        "src": pa.array(s[pick], pa.int64()),
        "dst": pa.array(d[pick], pa.int64()),
        "la": batch["la"].take(pa.array(pick)),
        "lb": batch["lb"].take(pa.array(pick))})


def _lexmin_group(group: pa.Table) -> pa.Table:
    w = group["weight"].to_numpy(zero_copy_only=False)
    s = group["src"].to_numpy(zero_copy_only=False)
    d = group["dst"].to_numpy(zero_copy_only=False)
    i = int(np.lexsort((d, s, w))[0])
    return group.slice(i, 1)


def minimum_spanning_forest(edges: rd.Dataset, vertices: rd.Dataset, *,
                            weight_col: str | None = None,
                            max_rounds: int = 64,
                            ) -> tuple[rd.Dataset, rd.Dataset, int]:
    """Boruvka minimum spanning forest of the undirected view of
    ``edges`` over the ``vertices`` (vertex_id,) table.

    Returns ``(forest, labels, rounds)``: ``forest`` = the MSF edge
    Dataset (src, dst, weight) in canonical (src < dst) form — the unique
    forest under the strict (weight, src, dst) order; ``labels`` = the
    final (v, label) component table (label = an arbitrary-but-
    deterministic member id, the pointer-jump root); ``rounds`` = Boruvka
    rounds executed. Vertices absent from every edge are their own
    single-vertex trees. Raises after ``max_rounds`` non-converged rounds
    (log2(V) suffices; 64 covers any conceivable graph)."""
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    parts = _join_parts()
    canon = _canonical_weighted(edges, weight_col).materialize()
    labels = vertices.select_columns(["vertex_id"]).map_batches(
        lambda t: pa.table({"v": pc.cast(t["vertex_id"], pa.int64()),
                            "label": pc.cast(t["vertex_id"], pa.int64())}),
        batch_format="pyarrow")

    empty_forest = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "weight": pa.array([], pa.float64())}))
    forest_parts: list[rd.Dataset] = []

    canon, n_edges = _nonempty_blocks(canon)
    rounds = 0
    while n_edges and rounds < max_rounds:
        rounds += 1
        lab, _ = _nonempty_blocks(labels.materialize())
        la = lab.map_batches(
            lambda t: pa.table({"src": t["v"], "la": t["label"]}),
            batch_format="pyarrow")
        lb = lab.map_batches(
            lambda t: pa.table({"dst": t["v"], "lb": t["label"]}),
            batch_format="pyarrow")
        la, _ = _nonempty_blocks(la)
        lb, _ = _nonempty_blocks(lb)
        el = canon.join(la, join_type="inner", num_partitions=parts,
                        on=("src",))
        el, _ = _nonempty_blocks(el)
        if el is None:
            break
        el = el.join(lb, join_type="inner", num_partitions=parts,
                     on=("dst",))

        def crossing(batch: pa.Table) -> pa.Table:
            """Both endpoints' components bid for each crossing edge."""
            m = pc.invert(pc.equal(batch["la"], batch["lb"]))
            t = batch.filter(m)
            two = pa.concat_tables([
                t.append_column("comp", t["la"]),
                t.append_column("comp", t["lb"])])
            return _lexmin_partial(two)

        cand = el.map_batches(crossing, batch_format="pyarrow")
        cand, n_cand = _nonempty_blocks(cand)
        if cand is None or n_cand == 0:
            break
        sel = (cand.groupby("comp")
               .map_groups(_lexmin_group, batch_format="pyarrow")
               .materialize())

        # forest edges this round (two comps may pick the same edge)
        picked = sel.map_batches(
            lambda t: pa.Table.from_arrays(
                [t["src"], t["dst"], t["weight"]],
                names=["src", "dst", "weight"])
            .group_by(["src", "dst"]).aggregate([("weight", "min")])
            .rename_columns(["src", "dst", "weight"]),
            batch_format="pyarrow")
        forest_parts.append(
            picked.groupby(["src", "dst"])
            .aggregate(Min("weight", alias_name="weight")).materialize())

        # pointer table: comp -> the other endpoint's component. Mutual
        # picks form 2-cycles (same edge chosen from both sides under the
        # total order); break them toward the smaller id, then jump.
        ptr = sel.map_batches(
            lambda t: pa.table({
                "c": t["comp"],
                "p": pc.if_else(pc.equal(t["comp"], t["la"]),
                                t["lb"], t["la"])}),
            batch_format="pyarrow").materialize()

        for _ in range(max_rounds):
            ptr, _ = _nonempty_blocks(ptr)
            gp = ptr.map_batches(
                lambda t: pa.table({"p": t["c"], "gp": t["p"]}),
                batch_format="pyarrow")
            gp, _ = _nonempty_blocks(gp)
            j = ptr.join(gp, join_type="left_outer",
                         num_partitions=parts, on=("p",))

            def jump(batch: pa.Table) -> pa.Table:
                c = batch["c"].to_numpy(zero_copy_only=False)
                p = batch["p"].to_numpy(zero_copy_only=False)
                g = (pc.fill_null(batch["gp"], -1)
                     .to_numpy(zero_copy_only=False).astype(np.int64))
                nxt = np.where(g < 0, p, g)          # p is a root
                # gp == c means c <-> p is a mutual pair (the unique
                # 2-cycle of this pseudo-tree): both resolve to min(c, p)
                nxt = np.where(nxt == c, np.minimum(c, p), nxt)
                return pa.table({
                    "c": pa.array(c, pa.int64()),
                    "p": pa.array(nxt, pa.int64()),
                    "_moved": pa.array((nxt != p).astype(np.int64))})

            jd = j.map_batches(jump, batch_format="pyarrow").materialize()
            moved = sum(
                int(pc.sum(b["_moved"]).as_py() or 0)
                for b in _iter_blocks(jd) if b.num_rows)
            ptr = jd.drop_columns(["_moved"])
            if moved == 0:
                break

        # relabel: label' = root(label) where the label was merged
        roots = ptr.map_batches(
            lambda t: pa.table({"label": t["c"], "root": t["p"]}),
            batch_format="pyarrow")
        roots, _ = _nonempty_blocks(roots)
        lj = lab.join(roots, join_type="left_outer",
                      num_partitions=parts, on=("label",))
        labels = lj.map_batches(
            lambda t: pa.table({
                "v": t["v"],
                "label": pc.coalesce(t["root"], t["label"])}),
            batch_format="pyarrow")

        # edges whose endpoints merged are settled; keep only the rest.
        # (cheap filter pass, same join shape — keeps later rounds small)
        canon = _filter_intra(canon, labels, parts)
        canon, n_edges = _nonempty_blocks(canon.materialize())
    else:
        if n_edges:
            raise RuntimeError(
                f"Boruvka did not converge in {max_rounds} rounds")

    if not forest_parts:
        return empty_forest, labels.materialize(), rounds
    forest = forest_parts[0]
    for f in forest_parts[1:]:
        forest = forest.union(f)
    # distinct across rounds is unnecessary (merged components never
    # re-bid) but cheap insurance against double-picks within a round
    forest = (forest.groupby(["src", "dst"])
              .aggregate(Min("weight", alias_name="weight")))
    return forest, labels.materialize(), rounds


def _iter_blocks(ds: rd.Dataset):
    import ray
    for ref in ds.to_arrow_refs():
        yield ray.get(ref)


def _filter_intra(canon: rd.Dataset, labels: rd.Dataset,
                  parts: int) -> rd.Dataset:
    """Drop edges that became intra-component (both endpoints share a
    label) — they can never be picked again."""
    from metis_ray.pipelines.dedup import _nonempty_blocks

    lab, _ = _nonempty_blocks(labels.materialize())
    if lab is None:
        return canon
    la = lab.map_batches(
        lambda t: pa.table({"src": t["v"], "la": t["label"]}),
        batch_format="pyarrow")
    lb = lab.map_batches(
        lambda t: pa.table({"dst": t["v"], "lb": t["label"]}),
        batch_format="pyarrow")
    la, _ = _nonempty_blocks(la)
    lb, _ = _nonempty_blocks(lb)
    out = canon.join(la, join_type="inner", num_partitions=parts,
                     on=("src",))
    out, _ = _nonempty_blocks(out)
    if out is None:        # only when canon itself was empty
        return canon.limit(0)
    out = out.join(lb, join_type="inner", num_partitions=parts,
                   on=("dst",))
    return out.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["la"], t["lb"])))
        .select(["src", "dst", "weight"]),
        batch_format="pyarrow")


def mst_reference(edges: list[tuple], vertices: list[int],
                  ) -> list[tuple]:
    """Sequential Kruskal under the SAME strict (weight, src, dst) total
    order over canonical pairs (the pytest/DuckDB golden). ``edges`` =
    (src, dst, weight) tuples, any orientation/multiplicity. Returns the
    sorted forest [(src, dst, weight)] with src < dst."""
    best: dict[tuple[int, int], float] = {}
    for a, b, w in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        if k not in best or w < best[k]:
            best[k] = float(w)
    parent = {int(v): int(v) for v in vertices}
    for (a, b) in best:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (a, b), w in sorted(best.items(), key=lambda kv:
                            (kv[1], kv[0][0], kv[0][1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)
