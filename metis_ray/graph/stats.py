"""Whole-graph scalar statistics as pure Ray Data compositions.

Density, reciprocity, degree assortativity and per-vertex local clustering
coefficients over the dependency edge table — the whole-graph analogue of
the reference's per-run summary tallies (rec_count tables, SURVEY.md §2.5's
global aggregates): the key here is the graph itself rather than a record
type.

Scale shape (the 100 TB contract): every scalar reduces to (a) the same
distinct-edge / degree shuffles the triangle pipeline already pays and
(b) per-batch INTEGER partial sums folded on the driver — O(1) numbers
cross the cluster boundary, nothing materializes the edge table into
driver memory. Partials are accumulated as int64 per batch and
arbitrary-precision Python ints on the driver, so every statistic is
EXACT and independent of partitioning / batch order (the same determinism
contract as q3's round-before-sort); only the final division is float.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from metis_ray.graph.partition import canonical_edges
from metis_ray.graph.triangles import _degrees, triangle_counts


def _join_parts() -> int:
    from metis_ray.pipelines.dedup import _join_parts as jp
    return jp()


def distinct_edges(edges: rd.Dataset) -> rd.Dataset:
    """Distinct directed (src, dst) pairs — the DiGraph view. The corpus
    edge table is already distinct (multiplicity aggregated at resolve),
    but the API accepts any raw edge list."""
    return (edges.select_columns(["src", "dst"])
            .groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
            .select_columns(["src", "dst"]))


def _fold_partials(ds: rd.Dataset, cols: list[str]) -> list[int]:
    """Sum tiny per-batch partial rows on the driver as Python ints
    (exact, order-free)."""
    df = ds.to_pandas()
    return [int(df[c].sum()) if len(df) else 0 for c in cols]


def reciprocity(edges: rd.Dataset) -> dict:
    """Edge reciprocity of the directed graph: |E ∩ E^T| / |E| over the
    distinct edge set (NetworkX ``overall_reciprocity``; self-loops, if
    present, count as reciprocated). One canonical-pair shuffle; the
    driver sees two integers."""
    return _reciprocity_distinct(distinct_edges(edges))


def _reciprocity_distinct(e: rd.Dataset) -> dict:

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(np.minimum(s, d), pa.int64()),
                         "b": pa.array(np.maximum(s, d), pa.int64())})

    pairs = (e.map_batches(canon, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Count(alias_name="cnt")))

    def partial(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        total = int(c.sum())
        # self-loop rows (a==b, cnt==1) are reciprocated by definition;
        # a 2-row pair means both directions exist => 2 reciprocated edges
        recip = int(np.where(a == b, c, np.where(c == 2, 2, 0)).sum())
        return pa.table({"recip": pa.array([recip], pa.int64()),
                         "total": pa.array([total], pa.int64())})

    recip, total = _fold_partials(
        pairs.map_batches(partial, batch_format="pyarrow"),
        ["recip", "total"])
    return {"reciprocated": recip, "edges": total,
            "reciprocity": (recip / total) if total else float("nan")}


def degree_assortativity(edges: rd.Dataset) -> dict:
    """Directed out-in degree assortativity (the NetworkX
    ``degree_assortativity_coefficient`` default for DiGraphs): Pearson
    correlation of (out-degree(src), in-degree(dst)) over the distinct
    edge set. Two count shuffles + two hash joins; per-batch int64 sums
    (n, Σx, Σy, Σx², Σy², Σxy) fold exactly on the driver."""
    return _assortativity_distinct(distinct_edges(edges))


def _assortativity_distinct(e: rd.Dataset) -> dict:
    from metis_ray.pipelines.dedup import _nonempty_blocks

    e, n_edges = _nonempty_blocks(e)
    if e is None:
        return {"edges": 0, "assortativity": float("nan")}
    parts = _join_parts()
    # compact the RIGHT sides too: groupby outputs can carry schema-less
    # zero-row blocks and the per-partition join raises on either side
    outdeg, _ = _nonempty_blocks(
        e.groupby("src").aggregate(Count(alias_name="xdeg")))
    indeg, _ = _nonempty_blocks(
        e.groupby("dst").aggregate(Count(alias_name="ydeg")))
    if outdeg is None or indeg is None:
        return {"edges": 0, "assortativity": float("nan")}
    j = e.join(outdeg, join_type="inner", num_partitions=parts, on=("src",))
    j, _ = _nonempty_blocks(j)   # chained joins choke on empty partitions
    if j is None:
        return {"edges": 0, "assortativity": float("nan")}
    j = j.join(indeg, join_type="inner", num_partitions=parts, on=("dst",))

    def partial(batch: pa.Table) -> pa.Table:
        x = batch["xdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["ydeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    n, sx, sy, sxx, syy, sxy = _fold_partials(
        j.map_batches(partial, batch_format="pyarrow"),
        ["n", "sx", "sy", "sxx", "syy", "sxy"])
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if n == 0 or vx == 0 or vy == 0:
        return {"edges": n, "assortativity": float("nan")}
    # exact integer moments; the ONLY float op is this final expression
    r = (n * sxy - sx * sy) / float(np.sqrt(float(vx) * float(vy)))
    return {"edges": n, "assortativity": r}


def graph_summary(edges: rd.Dataset, vertices: rd.Dataset) -> pa.Table:
    """One-row summary: vertex/edge counts, density, reciprocity,
    out-in degree assortativity. All exact (see module docstring);
    floats rounded to 6 dp so the DuckDB twin (same integer moments,
    same final expression) hashes identically."""
    n_vertices = vertices.count()
    e = distinct_edges(edges).materialize()   # ONE dedup shuffle, shared
    rec = _reciprocity_distinct(e)
    asst = _assortativity_distinct(e)
    m = rec["edges"]
    density = (m / (n_vertices * (n_vertices - 1))
               if n_vertices > 1 else float("nan"))
    return pa.table({
        "n_vertices": pa.array([n_vertices], pa.int64()),
        "n_edges": pa.array([m], pa.int64()),
        "density": pa.array([round(density, 6)], pa.float64()),
        "reciprocity": pa.array([round(rec["reciprocity"], 6)],
                                pa.float64()),
        "assortativity": pa.array([round(asst["assortativity"], 6)],
                                  pa.float64()),
    })


def _no_self_loops(edges: rd.Dataset) -> rd.Dataset:
    """Self-loops never contribute to triangles / clustering / modularity
    in the NetworkX semantics these functions mirror — drop them at the
    read so degrees are not inflated."""
    return edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow")


def modularity(edges: rd.Dataset, labels: rd.Dataset) -> pa.Table:
    """Newman modularity of a vertex partition over the undirected view:
    Q = Σ_c [ e_c/m − (deg_c / 2m)² ] = sw/m − Σ_c deg_c² / (4m²), with
    sw = within-community edges, deg_c = community degree sum, m =
    undirected edge count (NetworkX ``community.modularity``;
    self-loops are dropped, and a label table that does not cover every
    edge-incident vertex raises like NetworkX's NotAPartition). ``labels`` is a (v, label) Dataset — e.g. the
    LPA / CC / SCC output. Two label joins + one groupby(label); the
    driver folds three exact integers; the only float ops are the two
    final divisions. Returns one row (n_edges, n_communities,
    modularity)."""
    from ray.data.aggregate import Sum

    from metis_ray.pipelines.dedup import _nonempty_blocks

    parts = _join_parts()
    canon = canonical_edges(_no_self_loops(edges))
    lab = labels.select_columns(["v", "label"])

    e, m = _nonempty_blocks(canon)
    n_comm = (lab.groupby("label").aggregate(Count(alias_name="_n"))
              .count())
    if e is None or m == 0:
        return pa.table({"n_edges": pa.array([0], pa.int64()),
                         "n_communities": pa.array([n_comm], pa.int64()),
                         "modularity": pa.array([float("nan")],
                                                pa.float64())})

    # Validate the partition BEFORE the expensive within-community joins.
    # A duplicate v row would both double-count deg_c/sw and make the
    # coverage row count below lie (rows == distinct vertices only when
    # v is unique), so uniqueness is checked first.
    n_lab = lab.count()
    n_lab_v = lab.groupby("v").aggregate(Count(alias_name="_n")).count()
    if n_lab != n_lab_v:
        raise ValueError(
            f"labels hold {n_lab} rows over {n_lab_v} distinct vertices — "
            "duplicate vertex rows, not a partition of the graph")

    deg = _degrees(e).materialize()          # reuse the materialized edges
    n_deg = deg.count()
    dj_rows, n_cov = _nonempty_blocks(
        deg.join(lab, join_type="inner", num_partitions=parts, on=("v",)))
    # NetworkX raises NotAPartition here; a silent inner join would
    # compute a plausible-looking wrong Q over the labeled subset
    if n_cov != n_deg:
        raise ValueError(
            f"labels cover {n_cov} of {n_deg} edge-incident vertices — "
            "not a partition of the graph")

    la = lab.map_batches(lambda t: t.rename_columns(["src", "label_a"]),
                         batch_format="pyarrow")
    lb = lab.map_batches(lambda t: t.rename_columns(["dst", "label_b"]),
                         batch_format="pyarrow")
    la, _ = _nonempty_blocks(la)
    lb, _ = _nonempty_blocks(lb)
    if la is None or lb is None:       # unreachable: partition checked above
        raise ValueError("labels table is empty")
    j = e.join(la, join_type="inner", num_partitions=parts, on=("src",))
    j, _ = _nonempty_blocks(j)
    sw = 0
    if j is not None:
        j = j.join(lb, join_type="inner", num_partitions=parts, on=("dst",))

        def within(batch: pa.Table) -> pa.Table:
            a = batch["label_a"].to_numpy(zero_copy_only=False)
            b = batch["label_b"].to_numpy(zero_copy_only=False)
            return pa.table({"sw": pa.array([int((a == b).sum())],
                                            pa.int64())})

        (sw,) = _fold_partials(
            j.map_batches(within, batch_format="pyarrow"), ["sw"])
    dj = (dj_rows.groupby("label").aggregate(Sum("deg", alias_name="deg_c"))
          if dj_rows is not None else None)
    if dj is None:
        return pa.table({"n_edges": pa.array([m], pa.int64()),
                         "n_communities": pa.array([n_comm], pa.int64()),
                         "modularity": pa.array([float("nan")],
                                                pa.float64())})

    def degsq(batch: pa.Table) -> pa.Table:
        d = batch["deg_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"sq": pa.array([int((d * d).sum())], pa.int64())})

    (sdq,) = _fold_partials(dj.map_batches(degsq, batch_format="pyarrow"),
                            ["sq"])

    q = sw / m - sdq / (4.0 * m * m)
    return pa.table({"n_edges": pa.array([m], pa.int64()),
                     "n_communities": pa.array([n_comm], pa.int64()),
                     "modularity": pa.array([round(q, 6)], pa.float64())})


def average_neighbor_degree(edges: rd.Dataset,
                            vertices: rd.Dataset) -> rd.Dataset:
    """Average neighbor degree per vertex over the undirected view
    (NetworkX ``average_neighbor_degree``; self-loops dropped, isolated
    vertices get 0.0) — the degree-correlation profile behind
    assortativity, and the GNN-style neighbor-aggregation primitive
    (join features onto the symmetrized incidence, groupby the center).
    Degree sums are exact integers, so the result is deterministic at any
    partitioning; the only float op is the final IEEE division, emitted
    UNROUNDED — s/c from exact ints is bit-identical in numpy and DuckDB,
    while rounding would race the half-even/half-up boundary that ratios
    of small ints (power-of-two denominators) can hit exactly."""
    from ray.data.aggregate import Sum

    from metis_ray.pipelines.dedup import _nonempty_blocks

    parts = _join_parts()
    simple = _no_self_loops(edges.select_columns(["src", "dst"]))
    # ONE dedup shuffle, shared: degrees and the symmetrized view both
    # derive from the same materialized canonical pairs (symmetrized()
    # would re-run canonical_edges from scratch)
    canon = canonical_edges(simple).materialize()
    deg = _degrees(canon)                              # (v, deg) exact

    def _both(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    sym = canon.map_batches(_both, batch_format="pyarrow")  # (src=v, dst=n)

    base, n_base = _nonempty_blocks(vertices.map_batches(
        lambda t: pa.table({"v": t["vertex_id"]}), batch_format="pyarrow"))
    empty = pa.table({"v": pa.array([], pa.int64()),
                      "avg_neighbor_degree": pa.array([], pa.float64())})
    if base is None:
        return rd.from_arrow(empty)

    nd, _ = _nonempty_blocks(
        deg.map_batches(lambda t: t.rename_columns(["dst", "deg_n"]),
                        batch_format="pyarrow"))
    sym_ne, n_sym = _nonempty_blocks(sym)
    if sym_ne is not None and nd is not None:
        j = sym_ne.join(nd, join_type="inner", num_partitions=parts,
                        on=("dst",))
        j, _ = _nonempty_blocks(j)
    else:
        j = None
    if j is None:
        # no edges at all: every vertex is isolated
        return base.map_batches(
            lambda t: pa.table({
                "v": t["v"],
                "avg_neighbor_degree": pa.array(
                    np.zeros(t.num_rows), pa.float64())}),
            batch_format="pyarrow")

    agg = (j.map_batches(
               lambda t: pa.table({"v": t["src"], "deg_n": t["deg_n"]}),
               batch_format="pyarrow")
           .groupby("v").aggregate(Sum("deg_n", alias_name="s"),
                                   Count(alias_name="c")))
    agg, _ = _nonempty_blocks(agg)   # j nonempty => agg has rows
    out = base.join(agg, join_type="left_outer", num_partitions=parts,
                    on=("v",))

    def mean(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch["s"], 0).to_numpy(zero_copy_only=False)
        c = pc.fill_null(batch["c"], 0).to_numpy(zero_copy_only=False)
        m = np.where(c > 0, s / np.where(c > 0, c, 1), 0.0)
        return pa.table({"v": batch["v"],
                         "avg_neighbor_degree": pa.array(m, pa.float64())})

    return out.map_batches(mean, batch_format="pyarrow")


def clustering_coefficients(edges: rd.Dataset,
                            vertices: rd.Dataset) -> rd.Dataset:
    """Per-vertex local clustering coefficient over the undirected view:
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2 (NetworkX
    ``nx.clustering``; self-loops dropped, as NetworkX ignores them). Reuses the degree-oriented triangle pipeline
    (skew-safe, SURVEY.md §7.4) and the canonical degree table; vertices
    outside any edge get 0 via a left join from the vertex table. Rounded
    to 6 dp (float-division boundary, same contract as pagerank)."""
    from metis_ray.pipelines.dedup import _nonempty_blocks

    parts = _join_parts()
    simple = _no_self_loops(edges)
    tri = triangle_counts(simple)                      # (v, triangles) t>0
    deg = _degrees(canonical_edges(simple))            # (v, deg) deg>=1

    base, n_base = _nonempty_blocks(vertices.map_batches(
        lambda t: pa.table({"v": t["vertex_id"]}), batch_format="pyarrow"))
    if base is None:
        return rd.from_arrow(pa.table({"v": pa.array([], pa.int64()),
                                       "clustering": pa.array([],
                                                              pa.float64())}))
    deg, _ = _nonempty_blocks(deg)
    tri, _ = _nonempty_blocks(tri)
    if deg is None:                     # no edges: every coefficient is 0
        return base.map_batches(
            lambda t: pa.table({"v": t["v"],
                                "clustering": pa.array(
                                    np.zeros(t.num_rows), pa.float64())}),
            batch_format="pyarrow")
    j = base.join(deg, join_type="left_outer", num_partitions=parts,
                  on=("v",))
    j, _ = _nonempty_blocks(j)
    if j is None:
        return rd.from_arrow(pa.table({"v": pa.array([], pa.int64()),
                                       "clustering": pa.array([],
                                                              pa.float64())}))
    if tri is None:                     # triangle-free graph: T(v) == 0
        j = j.map_batches(
            lambda t: t.append_column(
                "triangles", pa.array(np.zeros(t.num_rows, np.int64),
                                      pa.int64())),
            batch_format="pyarrow")
    else:
        j = j.join(tri, join_type="left_outer", num_partitions=parts,
                   on=("v",))

    def cc(batch: pa.Table) -> pa.Table:
        d = pc.fill_null(batch["deg"], 0).to_numpy(zero_copy_only=False)
        t = pc.fill_null(batch["triangles"], 0).to_numpy(
            zero_copy_only=False)
        denom = d.astype(np.float64) * (d - 1)
        out = np.where(d >= 2, 2.0 * t / np.where(denom > 0, denom, 1.0),
                       0.0)
        return pa.table({"v": batch["v"],
                         "clustering": pa.array(np.round(out, 6),
                                                pa.float64())})

    return j.map_batches(cc, batch_format="pyarrow")


def mutual_edges(edges: rd.Dataset) -> rd.Dataset:
    """Reciprocal pairs of the DIRECTED distinct-edge view: canonical
    (src < dst) pairs present in BOTH orientations — the edge set whose
    cardinality drives ``summary()``'s reciprocity quotient. One
    canonicalize pass with a per-batch (pair -> orientation flags)
    combiner, then a single groupby(src, dst) max-shuffle; self-loops
    dropped (a loop is trivially its own reverse). Output (src, dst)."""
    from ray.data.aggregate import Max

    e = distinct_edges(_no_self_loops(edges))

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        fwd = a < b
        t = pa.table({
            "src": pa.array(np.minimum(a, b), pa.int64()),
            "dst": pa.array(np.maximum(a, b), pa.int64()),
            "fwd": pa.array(fwd.astype(np.int64), pa.int64()),
            "bwd": pa.array((~fwd).astype(np.int64), pa.int64())})
        g = t.group_by(["src", "dst"]).aggregate(
            [("fwd", "max"), ("bwd", "max")])
        return g.rename_columns(["src", "dst", "fwd", "bwd"])

    both = (e.map_batches(canon, batch_format="pyarrow")
            .groupby(["src", "dst"])
            .aggregate(Max("fwd", alias_name="fwd"),
                       Max("bwd", alias_name="bwd")))
    return both.map_batches(
        lambda t: t.filter(pc.and_(pc.greater(t["fwd"], 0),
                                   pc.greater(t["bwd"], 0)))
        .select(["src", "dst"]),
        batch_format="pyarrow")
