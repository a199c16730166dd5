"""HyperBall (graph/hyperball.py) vs exact BFS oracles.

HLL-approximate, so tolerances scale with the register count
(rse = 1.04/sqrt(2^p)); tests run p=10 (3.25% relative std error)."""

import numpy as np
import pyarrow as pa


def _mk(src, dst, n):
    import ray.data as rd
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n, dtype=np.int64), pa.int64())}))
    return edges, verts


def _exact(src, dst, n, max_t=200):
    """Per-t exact out-ball sizes + harmonic out-centrality via BFS."""
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    balls = []          # balls[v][t] = |B_out(v, t)|
    harm = np.zeros(n)
    for v in range(n):
        dist = {v: 0}
        frontier = [v]
        t = 0
        sizes = [1]
        while frontier and t < max_t:
            t += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = t
                        nxt.append(w)
            frontier = nxt
            if nxt:
                sizes.append(sizes[-1] + len(nxt))
        balls.append(sizes)
        harm[v] = sum(1.0 / d for u, d in dist.items() if d > 0)
    t_max = max(len(s) for s in balls)
    nf = [sum(s[min(t, len(s) - 1)] for s in balls) for t in range(t_max)]
    return nf, harm


def test_hyperball_neighborhood_function():
    from metis_ray.graph.hyperball import hyperball
    rng = np.random.RandomState(4)
    n, m = 60, 240
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    edges, verts = _mk(src, dst, n)
    out = hyperball(edges, verts, p=10)
    nf_exact, harm_exact = _exact(src, dst, n)
    nf_est = out["nf"].column("nf").to_pylist()
    # estimated NF tracks exact NF at every t (4.6-sigma band)
    for t in range(min(len(nf_est), len(nf_exact))):
        assert abs(nf_est[t] - nf_exact[t]) / nf_exact[t] < 0.15, t
    # fixpoint estimate vs exact total reachability
    assert abs(nf_est[-1] - nf_exact[-1]) / nf_exact[-1] < 0.15
    # harmonic centrality: strong per-vertex agreement in aggregate
    got_h = out["centrality"].column("harmonic").to_numpy()
    assert abs(got_h.sum() - harm_exact.sum()) / harm_exact.sum() < 0.25
    r = np.corrcoef(got_h, harm_exact)[0, 1]
    assert r > 0.9

    # effective diameter within one hop of the exact interpolation
    target = 0.9 * nf_exact[-1]
    d_exact = 0.0
    for t, v in enumerate(nf_exact):
        if v >= target:
            d_exact = (t - 1 + (target - nf_exact[t - 1])
                       / (v - nf_exact[t - 1])) if t else 0.0
            break
    assert abs(out["effective_diameter"] - d_exact) <= 1.0


def test_hyperball_deterministic_and_structured():
    from metis_ray.graph.hyperball import hyperball
    # directed path 0->1->2->3: balls grow by exactly one per hop
    edges, verts = _mk([0, 1, 2], [1, 2, 3], 4)
    a = hyperball(edges, verts, p=10)
    b = hyperball(edges, verts, p=10)
    assert a["nf"].equals(b["nf"])                  # bit-deterministic
    assert a["effective_diameter"] == b["effective_diameter"]
    nf = a["nf"].column("nf").to_pylist()
    # tiny cardinalities sit in the linear-counting regime => exact
    assert [round(x) for x in nf] == [4, 7, 9, 10]
    balls = a["centrality"].column("ball").to_pylist()
    assert [round(x) for x in balls] == [4, 3, 2, 1]
    assert a["epochs"] == 4                          # 3 growth + 1 fixpoint


def test_hyperball_no_edges():
    from metis_ray.graph.hyperball import hyperball
    import ray.data as rd
    edges = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(5, dtype=np.int64), pa.int64())}))
    out = hyperball(edges, verts, p=10)
    assert out["effective_diameter"] == 0.0
    assert out["centrality"].column("harmonic").to_pylist() == [0.0] * 5
