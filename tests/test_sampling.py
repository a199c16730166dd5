"""k-hop neighborhood sampling (graph/sampling.py) vs the sequential
transcription of the exact recurrence."""

import numpy as np
import pyarrow as pa


def _mk(src, dst):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}))


def _adj(src, dst, directed=True):
    adj = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), set()).add(int(b))
        if not directed:
            adj.setdefault(int(b), set()).add(int(a))
    return adj


def _rows(ds):
    df = ds.to_pandas()
    if not len(df):
        return []
    return sorted(zip(df["hop"].astype(int), df["src"].astype(int),
                      df["dst"].astype(int)))


def test_khop_matches_sequential_reference():
    from metis_ray.graph.sampling import khop_reference, khop_sample
    rng = np.random.RandomState(5)
    n, m = 60, 700
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    seeds = [0, 7, 13, 21, 55]
    got = _rows(khop_sample(_mk(src, dst), seeds, fanouts=(4, 3), seed=9))
    want = khop_reference(_adj(src, dst), seeds, fanouts=(4, 3), seed=9)
    assert got == want
    # fanout respected: no src emits more than 4 (hop 1) / 3 (hop 2)
    from collections import Counter
    per = Counter((h, s) for h, s, _ in got)
    assert all(c <= (4 if h == 1 else 3) for (h, _), c in per.items())
    # every sampled edge is a real directed edge
    e = set(zip(src.tolist(), dst.tolist()))
    assert all((s, d) in e for _, s, d in got)
    # hop-2 sources are exactly hop-1 destinations that have out-edges
    h1_dst = {d for h, _, d in got if h == 1}
    h2_src = {s for h, s, _ in got if h == 2}
    assert h2_src == {v for v in h1_dst if any(a == v for a, _ in e)}


def test_khop_undirected_and_duplicates():
    """Duplicate input edges collapse before sampling; undirected view
    expands both directions."""
    from metis_ray.graph.sampling import khop_reference, khop_sample
    src = [1, 1, 1, 2, 3, 3]
    dst = [2, 2, 3, 4, 4, 4]                       # dups: (1,2)x2, (3,4)x2
    got = _rows(khop_sample(_mk(src, dst), [4], fanouts=(2, 2),
                            seed=1, directed=False))
    want = khop_reference(_adj(src, dst, directed=False), [4],
                          fanouts=(2, 2), seed=1)
    assert got == want
    assert len(got) > 0


def test_khop_dead_end_and_empty():
    from metis_ray.graph.sampling import khop_sample
    # seed with no out-edges -> empty result with the right schema
    ds = _mk([1], [2])
    out = khop_sample(ds, [99], fanouts=(3,))
    assert out.count() == 0
    # frontier dies at hop 1 -> only hop-1 rows
    got = _rows(khop_sample(ds, [1], fanouts=(3, 3)))
    assert got == [(1, 1, 2)]
