"""Pure-Dataset superstep engine: PageRank as map_batches + groupby shuffle.

The actor engine (runner.py) is the fast path; this module is the same
superstep expressed ENTIRELY in the Dataset algebra — scatter is a
``map_batches`` join of edges with the rank table, gather is a
``groupby(dst).sum`` hash shuffle with a per-batch pre-aggregation combiner,
and apply is a vectorized projection.  It exists because (a) it is the
formulation that generalizes to any Ray cluster feature (autoscaling,
fault-tolerant shuffle) with zero custom state, and (b) it carries the
EXPLICIT skew controls: the combiner collapses each block's contributions
per destination before the shuffle, and ``salt`` splits listed hot
destinations into S subkeys aggregated in two stages (salted groupby, then
unsalt groupby) — SURVEY.md section 4.2.4.

Per-superstep cost is two materializations and one shuffle; the actor engine
amortizes all of that into resident state.  Both are tested equal (tiny
scale) and both match NetworkX.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _outdegrees(edges: rd.Dataset) -> rd.Dataset:
    return edges.groupby("src").aggregate(Count(alias_name="outdeg"))


def pagerank_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                     alpha: float = 0.85, tol: float = 1e-9,
                     max_iter: int = 100, hot_keys: set[int] | None = None,
                     salt: int = 8,
                     weight_col: str | None = None,
                     personalization: dict[int, float] | None = None,
                     ) -> tuple[rd.Dataset, int]:
    """PageRank over (src, dst) edges + (vertex_id,) vertices.

    Returns (ranks dataset with columns (v, rank), epochs run).  The rank
    table is broadcast per superstep (``ray.put`` of a v->contrib map): right
    for rank tables that fit a node's memory; beyond that, replace the
    broadcast with ``edges.join(ranks)`` — the shuffle shape is identical.
    ``hot_keys``/``salt``: destinations in ``hot_keys`` are salted into
    ``salt`` subkeys before the groupby and unsalted after.
    ``weight_col`` (e.g. ``'multiplicity'``): edge-weighted PageRank —
    contributions scale by weight / out-STRENGTH (sum of outgoing weights),
    NetworkX ``pagerank(weight=...)`` semantics; tested equal.
    ``personalization``: vertex -> weight teleport distribution (normalized
    here; vertices absent from the dict get 0) — personalized PageRank with
    the dangling mass also redistributed by it, NetworkX
    ``pagerank(personalization=...)`` semantics; tested equal. Seed-set
    personalization is the quality-propagation primitive (rank flows out
    from trusted seeds)."""
    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy())
    n = len(vid)

    if personalization is None:
        pvec = np.full(n, 1.0 / n)
    else:
        pvec = np.zeros(n, dtype=np.float64)
        keys = np.fromiter(personalization.keys(), dtype=np.int64)
        vals = np.fromiter((personalization[int(k)] for k in keys),
                           dtype=np.float64)
        pos = np.searchsorted(vid, keys)
        if (pos >= n).any() or (vid[np.minimum(pos, n - 1)] != keys).any():
            raise ValueError("personalization key is not a graph vertex")
        pvec[pos] = vals
        s = pvec.sum()
        if s <= 0:
            raise ValueError("personalization weights must sum > 0")
        pvec /= s

    if weight_col is None:
        deg = _outdegrees(edges).to_pandas()
    else:
        deg = (edges.groupby("src")
               .aggregate(Sum(weight_col, alias_name="outdeg")).to_pandas())
    outdeg = np.zeros(n, dtype=np.float64)
    outdeg[np.searchsorted(vid, deg["src"].to_numpy())] = deg["outdeg"].to_numpy()
    dangling = outdeg == 0.0

    hot = np.array(sorted(hot_keys), dtype=np.int64) if hot_keys else None
    x = np.full(n, 1.0 / n)     # nx starts uniform even when personalized
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    edges = edges.select_columns(cols).materialize()

    epochs = 0
    for epoch in range(max_iter):
        contrib = np.where(dangling, 0.0, x / np.where(outdeg > 0, outdeg, 1.0))
        ref = ray.put((vid, contrib, hot))

        def scatter(batch: pa.Table) -> pa.Table:
            v, c, hot_arr = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            vals = c[np.searchsorted(v, src)]
            if weight_col is not None:
                vals = vals * batch[weight_col].to_numpy(
                    zero_copy_only=False).astype(np.float64)
            if hot_arr is not None and len(hot_arr):
                is_hot = np.isin(dst, hot_arr)
                salt_col = np.where(is_hot, src % salt, 0).astype(np.int64)
            else:
                salt_col = np.zeros(len(dst), dtype=np.int64)
            t = pa.table({"dst": pa.array(dst, pa.int64()),
                          "s": pa.array(salt_col, pa.int64()),
                          "m": pa.array(vals, pa.float64())})
            # combiner: collapse per (dst, salt) BEFORE the shuffle
            g = t.group_by(["dst", "s"]).aggregate([("m", "sum")])
            return g.select(["dst", "s", "m_sum"]).rename_columns(["dst", "s", "m"])

        salted = (edges.map_batches(scatter, batch_format="pyarrow")
                  .groupby(["dst", "s"]).aggregate(Sum("m", alias_name="m")))
        incoming_df = (salted.groupby("dst").aggregate(Sum("m", alias_name="m"))
                       .to_pandas())

        inc = np.zeros(n)
        inc[np.searchsorted(vid, incoming_df["dst"].to_numpy())] = \
            incoming_df["m"].to_numpy()
        danglesum = float(x[dangling].sum())
        x_new = alpha * (inc + danglesum * pvec) + (1.0 - alpha) * pvec
        delta = float(np.abs(x_new - x).sum())
        x = x_new
        epochs = epoch + 1
        if delta < n * tol:
            break

    return rd.from_arrow(pa.table({"v": pa.array(vid, pa.int64()),
                                   "rank": pa.array(x, pa.float64())})), epochs


def components_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                       max_iter: int = 200) -> tuple[rd.Dataset, int]:
    """Connected components as pure Dataset supersteps: per-batch partial
    min (combiner) -> ``groupby(dst).min`` shuffle -> driver fold. Exact
    (component id = min vertex id); tested equal to the actor engine and
    NetworkX. Same broadcast caveat as ``pagerank_dataset``."""
    from ray.data.aggregate import Min

    from metis_ray.graph.partition import symmetrized

    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy())
    n = len(vid)
    labels = vid.copy()
    und = symmetrized(edges.select_columns(["src", "dst"])).materialize()

    epochs = 0
    for epoch in range(max_iter):
        ref = ray.put((vid, labels))

        def scatter(batch: pa.Table) -> pa.Table:
            empty = pa.table({"dst": pa.array([], pa.int64()),
                              "m": pa.array([], pa.int64())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty        # zero-row blocks can be schema-less
            v, lab = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            t = pa.table({"dst": pa.array(dst, pa.int64()),
                          "m": pa.array(lab[np.searchsorted(v, src)], pa.int64())})
            g = t.group_by("dst").aggregate([("m", "min")])
            return g.select(["dst", "m_min"]).rename_columns(["dst", "m"])

        inc = (und.map_batches(scatter, batch_format="pyarrow")
               .groupby("dst").aggregate(Min("m", alias_name="m")).to_pandas())
        new = labels.copy()
        if "dst" in inc.columns and len(inc):
            pos = np.searchsorted(vid, inc["dst"].to_numpy())
            new[pos] = np.minimum(new[pos], inc["m"].to_numpy())
        changed = int((new != labels).sum())
        labels = new
        epochs = epoch + 1
        if changed == 0:
            break

    return rd.from_arrow(pa.table({"v": pa.array(vid, pa.int64()),
                                   "label": pa.array(labels, pa.int64())})), epochs


def labelprop_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                      max_iter: int = 30,
                      weight_col: str | None = None) -> tuple[rd.Dataset, int]:
    """Deterministic synchronous label propagation as pure Dataset
    supersteps — the frequency-label variant of the actor engine
    (``runner.label_propagation`` semantics, mirrored exactly): labels
    start as vertex ids; each round every vertex adopts the most frequent
    label among its neighbors' current labels (one vote per distinct
    undirected edge), ties broken by the smallest label; isolated vertices
    keep their label; stop at fixpoint or ``max_iter``.

    Scatter is a ``map_batches`` with a per-batch (dst, label) count
    combiner; gather is a ``groupby(dst, label).sum`` hash shuffle; the
    per-destination argmax (max count, then min label) runs on the
    aggregated (dst, label, count) rows. Same broadcast caveat as
    ``pagerank_dataset`` (the label vector is broadcast per superstep).
    ``weight_col`` (e.g. ``'multiplicity'``): weighted voting — each
    undirected edge votes with its weight summed over both directions
    (``symmetrized_weighted``) instead of 1; argmax by (max total weight,
    then min label). Makes the exact multiplicity column load-bearing in
    community detection."""
    from metis_ray.graph.partition import symmetrized, symmetrized_weighted

    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy())
    labels = vid.copy()
    if weight_col is None:
        und = symmetrized(edges.select_columns(["src", "dst"])).materialize()
    else:
        und = symmetrized_weighted(
            edges.select_columns(["src", "dst", weight_col]),
            weight_col).materialize()

    epochs = 0
    for epoch in range(max_iter):
        ref = ray.put((vid, labels))

        def scatter(batch: pa.Table) -> pa.Table:
            empty = pa.table({"dst": pa.array([], pa.int64()),
                              "m": pa.array([], pa.int64()),
                              "c": pa.array([], pa.float64())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty        # zero-row blocks can be schema-less
            v, lab = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            w = (np.ones(len(src)) if weight_col is None
                 else batch["w"].to_numpy(zero_copy_only=False)
                 .astype(np.float64))
            t = pa.table({"dst": pa.array(dst, pa.int64()),
                          "m": pa.array(lab[np.searchsorted(v, src)],
                                        pa.int64()),
                          "c": pa.array(w, pa.float64())})
            g = t.group_by(["dst", "m"]).aggregate([("c", "sum")])
            # select by NAME before renaming: the aggregate's column order
            # is a pyarrow implementation detail (keys-first on 16.x)
            return (g.select(["dst", "m", "c_sum"])
                    .rename_columns(["dst", "m", "c"]))

        votes = (und.map_batches(scatter, batch_format="pyarrow")
                 .groupby(["dst", "m"]).aggregate(Sum("c", alias_name="c"))
                 .to_pandas())
        new = labels.copy()
        if len(votes):
            votes = votes.sort_values(["dst", "c", "m"],
                                      ascending=[True, False, True])
            pick = votes.drop_duplicates("dst", keep="first")
            pos = np.searchsorted(vid, pick["dst"].to_numpy())
            new[pos] = pick["m"].to_numpy()
        changed = int((new != labels).sum())
        labels = new
        epochs = epoch + 1
        if changed == 0:
            break

    return rd.from_arrow(pa.table({"v": pa.array(vid, pa.int64()),
                                   "label": pa.array(labels, pa.int64())})), epochs


def degree_histogram(edges: rd.Dataset, *, col: str = "dst") -> rd.Dataset:
    """(degree, n_vertices): the skew diagnostic that picks hot keys
    (SURVEY.md section 4.1 'skew/stragglers')."""
    deg = edges.groupby(col).aggregate(Count(alias_name="degree"))
    return deg.groupby("degree").aggregate(Count(alias_name="n_vertices"))


def hot_vertices(edges: rd.Dataset, *, col: str = "dst",
                 top_k: int = 16) -> list[int]:
    """The top-k in-degree vertices — the salt set for skewed gathers."""
    deg = edges.groupby(col).aggregate(Count(alias_name="degree"))
    top = deg.sort("degree", descending=True).limit(top_k).to_pandas()
    return [int(v) for v in top[col]]


def coreness_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                     max_iter: int = 200) -> tuple[rd.Dataset, int]:
    """k-core decomposition (core number per vertex) as pure Dataset
    supersteps, via the h-index iteration (Lu et al. 2016, "Vital nodes
    identification in complex networks"): start h(v) = degree(v); each
    round h(v) <- H({h(u) : u ~ v}) where H is the h-index operator (the
    largest k such that at least k neighbors have value >= k). The
    sequence is monotone non-increasing and its fixpoint is exactly the
    core number — NetworkX ``core_number`` semantics on the undirected
    simple graph (parallel edges collapsed, self-loops dropped, isolated
    vertices get core 0).

    Scatter ships each edge's source h value; gather is a
    ``groupby(dst, h).count`` hash shuffle (rows = per-vertex DISTINCT
    neighbor-h values, <= E, typically far fewer once h values collapse);
    the per-vertex H-index folds on the driver (same driver-table caveat
    as ``labelprop_dataset`` — beyond that, the fold is itself one more
    ``map_groups`` by dst)."""
    from metis_ray.graph.partition import symmetrized

    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy())
    n = len(vid)

    # undirected simple graph: symmetrized() already collapses parallel
    # edges to distinct canonical pairs; only self-loops remain to drop
    und = (symmetrized(edges.select_columns(["src", "dst"]))
           .map_batches(lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
                        batch_format="pyarrow")
           .materialize())

    deg_df = und.groupby("src").aggregate(Count(alias_name="deg")).to_pandas()
    h = np.zeros(n, dtype=np.int64)
    if len(deg_df):
        h[np.searchsorted(vid, deg_df["src"].to_numpy())] = \
            deg_df["deg"].to_numpy()

    epochs = 0
    for epoch in range(max_iter):
        ref = ray.put((vid, h))

        def scatter(batch: pa.Table) -> pa.Table:
            empty = pa.table({"dst": pa.array([], pa.int64()),
                              "hv": pa.array([], pa.int64()),
                              "c": pa.array([], pa.int64())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            v, hh = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            t = pa.table({"dst": pa.array(dst, pa.int64()),
                          "hv": pa.array(hh[np.searchsorted(v, src)],
                                         pa.int64())})
            g = t.group_by(["dst", "hv"]).aggregate([("hv", "count")])
            return (g.select(["dst", "hv", "hv_count"])
                    .rename_columns(["dst", "hv", "c"]))

        rows = (und.map_batches(scatter, batch_format="pyarrow")
                .groupby(["dst", "hv"]).aggregate(Sum("c", alias_name="c"))
                .to_pandas())
        new = np.zeros(n, dtype=np.int64)
        if len(rows):
            rows = rows.sort_values(["dst", "hv"], ascending=[True, False])
            cum = rows.groupby("dst")["c"].cumsum().to_numpy()
            # H-index: max over the desc-sorted rows of min(h_value, #neighbors
            # with value >= h_value)
            cand = np.minimum(rows["hv"].to_numpy(), cum)
            hmax = (rows.assign(_cand=cand).groupby("dst")["_cand"].max())
            new[np.searchsorted(vid, hmax.index.to_numpy())] = \
                hmax.to_numpy()
        # clamp: the H sequence is non-increasing by theorem; enforcing it
        # also guards termination against any float/ordering edge case
        new = np.minimum(new, h)
        changed = int((new != h).sum())
        h = new
        epochs = epoch + 1
        if changed == 0:
            break

    return rd.from_arrow(pa.table({"v": pa.array(vid, pa.int64()),
                                   "core": pa.array(h, pa.int64())})), epochs


def bfs_distance_dataset(edges: rd.Dataset, vertices: rd.Dataset,
                         seeds: list[int] | set[int], *,
                         directed: bool = True,
                         max_iter: int = 10_000) -> tuple[rd.Dataset, int]:
    """Multi-source BFS hop distance as pure Dataset supersteps:
    ``dist(v)`` = fewest edges from any seed to ``v`` (following edge
    direction when ``directed``, else over the symmetrized graph);
    unreachable vertices get -1. The trust-distance primitive for seed-set
    curation (hops from a trusted whitelist). Scatter ships ``dist+1`` for
    FRONTIER sources only (vertices whose distance changed last round), so
    per-superstep work decays with the frontier — the same min-plus
    relaxation shape as ``components_dataset``."""
    from ray.data.aggregate import Min

    from metis_ray.graph.partition import symmetrized

    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy())
    n = len(vid)

    seed_arr = np.asarray(sorted(set(int(s) for s in seeds)), dtype=np.int64)
    pos = np.searchsorted(vid, seed_arr)
    if len(seed_arr) and ((pos >= n).any()
                          or (vid[np.minimum(pos, n - 1)] != seed_arr).any()):
        raise ValueError("seed is not a graph vertex")

    INF = np.iinfo(np.int64).max
    dist = np.full(n, INF, dtype=np.int64)
    dist[pos] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[pos] = True

    g = edges.select_columns(["src", "dst"])
    if not directed:
        g = symmetrized(g)
    g = g.materialize()

    epochs = 0
    for _ in range(max_iter):
        if not frontier.any():
            break
        ref = ray.put((vid, dist, frontier))

        def scatter(batch: pa.Table) -> pa.Table:
            empty = pa.table({"dst": pa.array([], pa.int64()),
                              "m": pa.array([], pa.int64())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            v, d, f = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            sp = np.searchsorted(v, src)
            live = f[sp]                       # frontier sources only
            if not live.any():
                return empty
            t = pa.table({"dst": pa.array(dst[live], pa.int64()),
                          "m": pa.array(d[sp[live]] + 1, pa.int64())})
            gt = t.group_by("dst").aggregate([("m", "min")])
            return gt.select(["dst", "m_min"]).rename_columns(["dst", "m"])

        inc = (g.map_batches(scatter, batch_format="pyarrow")
               .groupby("dst").aggregate(Min("m", alias_name="m"))
               .to_pandas())
        new = dist.copy()
        if "dst" in inc.columns and len(inc):
            p = np.searchsorted(vid, inc["dst"].to_numpy())
            new[p] = np.minimum(new[p], inc["m"].to_numpy())
        frontier = new != dist
        dist = new
        epochs += 1

    out = np.where(dist == INF, -1, dist)
    return rd.from_arrow(pa.table({"v": pa.array(vid, pa.int64()),
                                   "dist": pa.array(out, pa.int64())})), epochs


def hits_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                 max_iter: int = 100, tol: float = 1e-8,
                 ) -> tuple[rd.Dataset, int]:
    """HITS hubs & authorities as pure Dataset supersteps (Kleinberg's
    algorithm, NetworkX ``nx.hits`` semantics: per-round max-normalization,
    L1 convergence on hubs, final sum-normalization).

    Each superstep is two shuffles: authorities gather hub mass along
    edges (``groupby(dst).sum``), hubs gather authority mass against them
    (``groupby(src).sum``) — both with the per-batch pre-aggregation
    combiner this engine uses everywhere, so shuffle rows are bounded by
    (block count x distinct keys per block), not edge count.  Same
    broadcast caveat as ``pagerank_dataset``: the n-sized vector rides
    ``ray.put`` per superstep; beyond one node's memory the broadcast
    becomes an ``edges.join(ranks)`` with an identical shuffle shape.

    Returns (dataset (v, hub, authority), epochs).  Converged output is
    the principal eigenvector pair of A^T A / A A^T — tested against
    NetworkX at 1e-6."""
    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy())
    n = len(vid)
    if n == 0:
        return rd.from_arrow(pa.table({
            "v": pa.array([], pa.int64()),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64())})), 0

    e = edges.select_columns(["src", "dst"]).materialize()

    def gather(src_col: str, dst_col: str, vec: np.ndarray) -> np.ndarray:
        """sum over edges of vec[src_col] grouped by dst_col."""
        ref = ray.put((vid, vec))

        def scatter(batch: pa.Table) -> pa.Table:
            empty = pa.table({"k": pa.array([], pa.int64()),
                              "m": pa.array([], pa.float64())})
            if src_col not in batch.column_names or batch.num_rows == 0:
                return empty
            v, x = ray.get(ref)
            s = batch[src_col].to_numpy(zero_copy_only=False)
            d = batch[dst_col].to_numpy(zero_copy_only=False)
            t = pa.table({"k": pa.array(d, pa.int64()),
                          "m": pa.array(x[np.searchsorted(v, s)],
                                        pa.float64())})
            g = t.group_by("k").aggregate([("m", "sum")])
            return g.select(["k", "m_sum"]).rename_columns(["k", "m"])

        inc = (e.map_batches(scatter, batch_format="pyarrow")
               .groupby("k").aggregate(Sum("m", alias_name="m")).to_pandas())
        out = np.zeros(n)
        if len(inc):
            out[np.searchsorted(vid, inc["k"].to_numpy())] = \
                inc["m"].to_numpy()
        return out

    h = np.full(n, 1.0 / n)
    epochs = 0
    for epoch in range(max_iter):
        hlast = h
        a = gather("src", "dst", hlast)       # authorities <- hub mass
        h = gather("dst", "src", a)           # hubs <- authority mass
        hmax, amax = h.max(), a.max()
        if hmax > 0:
            h = h / hmax
        if amax > 0:
            a = a / amax
        epochs = epoch + 1
        if float(np.abs(h - hlast).sum()) < tol:
            break

    hs, as_ = h.sum(), a.sum()
    return rd.from_arrow(pa.table({
        "v": pa.array(vid, pa.int64()),
        "hub": pa.array(h / hs if hs > 0 else h, pa.float64()),
        "authority": pa.array(a / as_ if as_ > 0 else a, pa.float64()),
    })), epochs


def scc_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                max_iter: int = 10_000) -> tuple[rd.Dataset, int]:
    """Strongly connected components as pure Dataset supersteps.

    Trim + forward/backward min-label peeling (the BSP "MultiStep" shape —
    Slota et al. 2014; Orzan's coloring is the same family):

      outer round:
        1. TRIM to fixpoint: an active vertex with zero active in-edges or
           zero active out-edges is a singleton SCC — one edge scan per
           trim round computes both active degrees. Import graphs are
           mostly DAG, so trim peels the bulk in O(depth) cheap rounds.
        2. F = forward min-label fixpoint (min active id that reaches v),
           B = the same on reversed edges (min active id v reaches).
           F(v) == B(v) == r certifies v ∈ SCC(r): r reaches v and v
           reaches r. The whole SCC of the globally-min active id peels
           every round, so outer rounds ≤ #SCCs (far fewer in practice).

    Output: (v, scc) with scc = min member vertex id — matches NetworkX
    ``strongly_connected_components`` exactly (pytest oracle). Returns
    (dataset, total supersteps). Parallel edges and self-loops are
    tolerated (a self-loop does not make a vertex non-trivial in NetworkX
    semantics either — SCCs are about mutual reachability between
    DISTINCT vertices, and a singleton is a singleton with or without a
    self-loop — so self-edges are dropped up front).

    Same memory contract as ``pagerank_dataset``: per-vertex state lives
    in driver numpy arrays broadcast per superstep (``ray.put``), edges
    stay a distributed materialized Dataset; swap the broadcast for an
    ``edges.join(state)`` when the vertex table outgrows one node — the
    shuffle shape is identical.
    """
    from ray.data.aggregate import Max, Min

    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy())
    n = len(vid)
    scc = np.full(n, -1, dtype=np.int64)
    active = np.ones(n, dtype=bool)

    e = edges.select_columns(["src", "dst"])
    e = e.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow").materialize()
    epochs = 0

    def degree_pass(ref) -> tuple[np.ndarray, np.ndarray]:
        """Active in/out degree in one scan: emit (v, side) for both
        endpoints of both-active edges, pre-combined per batch."""

        def scatter(batch: pa.Table) -> pa.Table:
            empty = pa.table({"v": pa.array([], pa.int64()),
                              "side": pa.array([], pa.int64()),
                              "c": pa.array([], pa.int64())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            v, act = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            keep = act[np.searchsorted(v, src)] & act[np.searchsorted(v, dst)]
            src, dst = src[keep], dst[keep]
            t = pa.table({
                "v": pa.array(np.concatenate([src, dst]), pa.int64()),
                "side": pa.array(np.concatenate([
                    np.zeros(len(src), np.int64),
                    np.ones(len(dst), np.int64)]), pa.int64()),
            })
            g = t.group_by(["v", "side"]).aggregate([([], "count_all")])
            return (g.select(["v", "side", "count_all"])
                    .rename_columns(["v", "side", "c"]))

        inc = (e.map_batches(scatter, batch_format="pyarrow")
               .groupby(["v", "side"]).aggregate(Sum("c", alias_name="c"))
               .to_pandas())
        outdeg = np.zeros(n, dtype=np.int64)
        indeg = np.zeros(n, dtype=np.int64)
        if len(inc):
            pos = np.searchsorted(vid, inc["v"].to_numpy())
            side = inc["side"].to_numpy()
            cnt = inc["c"].to_numpy()
            np.add.at(outdeg, pos[side == 0], cnt[side == 0])
            np.add.at(indeg, pos[side == 1], cnt[side == 1])
        return indeg, outdeg

    def minlabel_fixpoint(direction: str) -> np.ndarray:
        """Min-active-id reachability labels on the active subgraph;
        direction 'fwd' propagates src->dst, 'bwd' dst->src."""
        nonlocal epochs
        lab = np.where(active, vid, np.iinfo(np.int64).max)
        src_col, dst_col = (("src", "dst") if direction == "fwd"
                            else ("dst", "src"))
        while True:
            ref = ray.put((vid, lab, active))

            def scatter(batch: pa.Table) -> pa.Table:
                empty = pa.table({"k": pa.array([], pa.int64()),
                                  "m": pa.array([], pa.int64())})
                if "src" not in batch.column_names or batch.num_rows == 0:
                    return empty
                v, lb, act = ray.get(ref)
                s = batch[src_col].to_numpy(zero_copy_only=False)
                d = batch[dst_col].to_numpy(zero_copy_only=False)
                keep = act[np.searchsorted(v, s)] & act[np.searchsorted(v, d)]
                s, d = s[keep], d[keep]
                t = pa.table({"k": pa.array(d, pa.int64()),
                              "m": pa.array(lb[np.searchsorted(v, s)],
                                            pa.int64())})
                g = t.group_by("k").aggregate([("m", "min")])
                return g.select(["k", "m_min"]).rename_columns(["k", "m"])

            inc = (e.map_batches(scatter, batch_format="pyarrow")
                   .groupby("k").aggregate(Min("m", alias_name="m"))
                   .to_pandas())
            new = lab.copy()
            if len(inc):
                pos = np.searchsorted(vid, inc["k"].to_numpy())
                new[pos] = np.minimum(new[pos], inc["m"].to_numpy())
            epochs += 1
            if (new == lab).all():
                return lab
            lab = new

    rounds = 0
    while active.any():
        rounds += 1
        if rounds > max_iter:
            raise RuntimeError("scc_dataset did not converge "
                               f"within {max_iter} outer rounds")
        # 1. trim to fixpoint
        while True:
            ref = ray.put((vid, active))
            indeg, outdeg = degree_pass(ref)
            epochs += 1
            trim = active & ((indeg == 0) | (outdeg == 0))
            if not trim.any():
                break
            scc[trim] = vid[trim]
            active &= ~trim
        if not active.any():
            break
        # 2. forward/backward min-label; peel F == B
        f = minlabel_fixpoint("fwd")
        b = minlabel_fixpoint("bwd")
        peel = active & (f == b)
        scc[peel] = f[peel]
        active &= ~peel

    return rd.from_arrow(pa.table({"v": pa.array(vid, pa.int64()),
                                   "scc": pa.array(scc, pa.int64())})), epochs


def mis_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                seed: int = 0, max_iter: int = 10_000
                ) -> tuple[rd.Dataset, int]:
    """Maximal independent set by Luby-style local-minima supersteps over
    the symmetrized simple graph (self-loops dropped). Each vertex gets a
    fixed UNIQUE priority (rank of ``blake2b(seed, vertex_id)``, ties
    broken by id); a round selects every still-active vertex whose
    priority beats all active neighbors, then deactivates the selected
    vertices' neighbors. With fixed priorities this fixpoint computes
    exactly the sequential greedy MIS in priority order (the
    lexicographically-first MIS of the priority permutation), which is
    the exact-equality pytest oracle (``test_mis_matches_sequential_
    greedy``); independence and maximality are additionally asserted as
    graph invariants. Analogue of the reference's per-part winner-takes-
    all selection sweeps (Metis/tdms_import.py one-pass selections), as a
    superstep algorithm. Scatter ships (dst, priority[src]) for ACTIVE
    endpoints only, so per-round volume decays with the undecided set —
    the same frontier shape as ``bfs_distance_dataset``.

    Precondition (module-wide contract, same as ``pagerank_dataset``):
    every edge endpoint appears in ``vertices`` — ``searchsorted`` maps
    unknown endpoints to arbitrary slots otherwise."""
    import hashlib
    import warnings

    from metis_ray.graph.partition import symmetrized

    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    if "vertex_id" not in verts.columns or not len(verts):
        return rd.from_arrow(pa.table({"v": pa.array([], pa.int64()),
                                       "in_mis": pa.array([], pa.bool_())})), 0
    vid = np.sort(verts["vertex_id"].to_numpy())
    n = len(vid)

    # fixed unique priorities: rank of (digest, vertex_id) — deterministic,
    # parallelism-independent, uniform enough for O(log n) expected rounds
    dig = np.fromiter(
        (int.from_bytes(hashlib.blake2b(
            b"%d:%d" % (seed, v), digest_size=8).digest(), "big")
         for v in vid), dtype=np.uint64, count=n)
    prio = np.empty(n, dtype=np.int64)
    prio[np.lexsort((vid, dig))] = np.arange(n, dtype=np.int64)

    g = (symmetrized(edges.select_columns(["src", "dst"]))
         .map_batches(lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
                      batch_format="pyarrow")
         .materialize())

    active = np.ones(n, dtype=bool)
    in_mis = np.zeros(n, dtype=bool)
    epochs = 0
    for _ in range(max_iter):
        if not active.any():
            break
        ref = ray.put((vid, active, prio))

        def scatter(batch: pa.Table) -> pa.Table:
            empty = pa.table({"dst": pa.array([], pa.int64()),
                              "m": pa.array([], pa.int64())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            v, act, pr = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            sp = np.searchsorted(v, src)
            dp = np.searchsorted(v, dst)
            live = act[sp] & act[dp]          # both endpoints undecided
            if not live.any():
                return empty
            t = pa.table({"dst": pa.array(dst[live], pa.int64()),
                          "m": pa.array(pr[sp[live]], pa.int64())})
            gt = t.group_by("dst").aggregate([("m", "min")])
            return gt.select(["dst", "m_min"]).rename_columns(["dst", "m"])

        from ray.data.aggregate import Min
        inc = (g.map_batches(scatter, batch_format="pyarrow")
               .groupby("dst").aggregate(Min("m", alias_name="m"))
               .to_pandas())
        minnbr = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        if "dst" in inc.columns and len(inc):
            p = np.searchsorted(vid, inc["dst"].to_numpy())
            minnbr[p] = inc["m"].to_numpy()
        newly = active & (prio < minnbr)      # incl. no-active-neighbor
        in_mis |= newly
        active &= ~newly
        epochs += 1
        if not active.any():
            break
        # deactivate neighbors of the newly-selected set
        ref2 = ray.put((vid, newly))

        def knockout(batch: pa.Table) -> pa.Table:
            empty = pa.table({"dst": pa.array([], pa.int64())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            v, sel = ray.get(ref2)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            hit = sel[np.searchsorted(v, src)]
            if not hit.any():
                return empty
            return pa.table({"dst": pa.array(np.unique(dst[hit]), pa.int64())})

        out = (g.map_batches(knockout, batch_format="pyarrow")
               .groupby("dst").aggregate(Count(alias_name="c")).to_pandas())
        if "dst" in out.columns and len(out):
            p = np.searchsorted(vid, out["dst"].to_numpy())
            active[p] = False
        epochs += 1

    if active.any():
        # hash priorities make exhaustion vanishingly unlikely; a silent
        # return would break the documented maximality invariant
        warnings.warn(
            f"mis_dataset: {int(active.sum())} vertices still undecided "
            f"after max_iter={max_iter} rounds — result is independent "
            "but may not be maximal", RuntimeWarning)
    return rd.from_arrow(pa.table({"v": pa.array(vid, pa.int64()),
                                   "in_mis": pa.array(in_mis, pa.bool_())})), epochs


def mis_reference(adj: dict[int, set[int]], vid: np.ndarray,
                  prio: np.ndarray) -> np.ndarray:
    """Sequential greedy MIS in priority order — the exact oracle for
    ``mis_dataset``: visit vertices by increasing priority, include a
    vertex iff no already-included neighbor."""
    order = np.argsort(prio)
    chosen: set[int] = set()
    for i in order:
        v = int(vid[i])
        if not (adj.get(v, set()) & chosen):
            chosen.add(v)
    return np.array([int(v) in chosen for v in vid], dtype=bool)
