"""Deterministic synthetic source-code corpus generator (FIXTURES.md F1-F4).

Mirrors the reference's test strategy of *constructing* a golden input with
known field values (``tests/test_stdf_convert.py:78-173`` builds an STDF file
record by record) instead of shipping opaque golden outputs: the generator
emits the corpus table ``(repo, path, commit, lang, content)`` (the
``input_hint`` shape from BASELINE.json) *and*, from the same seeded draw, the
ground-truth symbol table and expected edge tables — so extraction can be
checked by set equality and graph algorithms against NetworkX on a graph that
is known by construction.

Everything is a pure function of ``seed`` (default 42): byte-identical tables
across runs and parallelism levels.  Graph shape knobs (per FIXTURES.md F1):

* repo sizes drawn Zipf(1.2)  -> skewed, a few giant repos;
* cross-repo imports target hub repos Zipf-style -> high in-degree vertices
  (the skew the salted/pre-combined shuffle path must handle);
* >= 3 isolated repos (no cross edges either way) -> nontrivial connected
  components;
* seeded triangle motifs (f0->f1, f1->f2, f0->f2 per repo) -> nonzero,
  predictable triangle counts;
* ~10% of imports target nonexistent modules -> exercises the
  unresolvable-import drop+count path (reference analogue: unknown record
  types tolerated + counted, ``Metis/tools/stdf2csv.py:178-182``);
* a small fraction of malformed rows (empty / binary-garbage content,
  unknown lang) -> exercises quarantine (``tests/test_gst_nok.py``).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "c", "javascript", "java", "go", "rust"]
_EXT = {"python": "py", "c": "c", "javascript": "js", "java": "java", "go": "go", "rust": "rs"}
_LANG_WEIGHTS = np.array([0.30, 0.15, 0.22, 0.12, 0.11, 0.10])


@dataclass(frozen=True)
class CorpusSpec:
    name: str
    n_files: int
    n_repos: int
    n_orgs: int = 8
    seed: int = 42
    mean_imports: float = 2.0
    p_ghost: float = 0.10          # import targets a nonexistent module
    p_cross: float = 0.25          # resolvable import crosses repos
    n_isolated_repos: int = 3      # repos with no cross edges at all
    malformed_rows: int = 0        # extra quarantine-bait rows
    files_per_part: int = 25_000   # parquet part-file granularity
    graph_goldens: bool = True     # emit components/labels/triangles goldens


SCALES: dict[str, CorpusSpec] = {
    "tiny": CorpusSpec("tiny", n_files=240, n_repos=12, malformed_rows=6),
    "small": CorpusSpec("small", n_files=20_000, n_repos=300, malformed_rows=40),
    "bench": CorpusSpec("bench", n_files=200_000, n_repos=2_000,
                        malformed_rows=0, graph_goldens=False),
}

# driver sf dirs -> corpus scale (TESTDATA.md: smoke sf0.001, correctness
# sf0.01, bench sf0.1)
SF_TO_SCALE = {"sf0.001": "tiny", "sf0.01": "small", "sf0.1": "bench"}


def scale_for_sf_dir(sf_dir: str) -> CorpusSpec:
    return SCALES[SF_TO_SCALE.get(os.path.basename(os.path.normpath(sf_dir)), "small")]


# --------------------------------------------------------------------------
# import-statement emission, one formatter per language (FIXTURES.md F1).
# The *canonical module key* of a file is its dotted path
# "org.repo.pkgJ.modK"; each language renders it with its own syntax and the
# extractor (stages/extract.py) normalizes back to the dotted key.
# --------------------------------------------------------------------------

def _emit_import(lang: str, module: str, k: int) -> str:
    slash = module.replace(".", "/")
    if lang == "python":
        if k % 2 == 0:
            return f"import {module}"
        head, _, tail = module.rpartition(".")
        return f"from {head} import {tail}"
    if lang == "c":
        if k % 3 == 2:
            return f"#include <{slash}.h>"
        return f'#include "{slash}.h"'
    if lang == "javascript":
        if k % 2 == 0:
            return f"import mod{k} from '{slash}';"
        return f"const mod{k} = require('{slash}');"
    if lang == "java":
        return f"import {module};"
    if lang == "go":
        return f'import "{slash}"'
    if lang == "rust":
        return f"use {module.replace('.', '::')};"
    raise ValueError(lang)


_FILLER = {
    "python": "def fn_{i}(x):\n    return x * {i} + 1\n",
    "c": "int fn_{i}(int x) {{ return x * {i} + 1; }}\n",
    "javascript": "function fn_{i}(x) {{ return x * {i} + 1; }}\n",
    "java": "    public int fn{i}(int x) {{ return x * {i} + 1; }}\n",
    "go": "func fn{i}(x int) int {{ return x*{i} + 1 }}\n",
    "rust": "fn fn_{i}(x: i64) -> i64 {{ x * {i} + 1 }}\n",
}


@dataclass
class GeneratedCorpus:
    spec: CorpusSpec
    corpus: pa.Table          # repo, path, commit, lang, content   (F1)
    modules: pa.Table         # module, repo, path                  (F2)
    edges_file: pa.Table      # src, dst, src_repo, dst_repo, multiplicity (F3, deduped, no self)
    edges_repo: pa.Table      # src, dst, src_repo, dst_repo, multiplicity
    files: pa.Table           # repo, path, vertex_id, quarantined (all rows)
    components: pa.Table | None = None   # v, component (min vid; NetworkX)
    labels: pa.Table | None = None       # v, label (deterministic LPA spec)
    triangles: pa.Table | None = None    # v, triangles > 0 (NetworkX)
    pageranks: pa.Table | None = None    # v, rank (fixed-150 power iteration)
    stats: dict = field(default_factory=dict)


def generate(spec: CorpusSpec) -> GeneratedCorpus:
    from metis_ray.functions.hashing import hash64_one

    rng = np.random.RandomState(spec.seed)

    # ---- repos: Zipf(1.2) sizes, one lang + one commit per repo ----------
    w = 1.0 / np.arange(1, spec.n_repos + 1) ** 1.2
    w /= w.sum()
    sizes = np.maximum(3, (w * spec.n_files).astype(np.int64))
    # trim/pad to exactly n_files
    while sizes.sum() > spec.n_files:
        sizes[np.argmax(sizes)] -= 1
    sizes[0] += spec.n_files - sizes.sum()

    repo_names = [f"org{i % spec.n_orgs}/repo{i}" for i in range(spec.n_repos)]
    repo_langs = [LANGS[i] for i in rng.choice(len(LANGS), size=spec.n_repos, p=_LANG_WEIGHTS)]
    repo_commits = [hashlib.sha1(f"{r}:{spec.seed}".encode()).hexdigest() for r in repo_names]
    isolated = set(range(spec.n_repos - spec.n_isolated_repos, spec.n_repos))
    # cross-repo target distribution: Zipf over non-isolated repos -> hubs
    open_repos = np.array([i for i in range(spec.n_repos) if i not in isolated])
    hub_w = 1.0 / np.arange(1, len(open_repos) + 1) ** 1.1
    hub_w /= hub_w.sum()

    # ---- files -----------------------------------------------------------
    repo_of: list[int] = []
    paths: list[str] = []
    mods: list[str] = []
    for r, n in enumerate(sizes):
        slug = repo_names[r].replace("/", ".")
        ext = _EXT[repo_langs[r]]
        for k in range(n):
            j = k // 8
            repo_of.append(r)
            paths.append(f"src/pkg{j}/mod{k}.{ext}")
            mods.append(f"{slug}.pkg{j}.mod{k}")
    n_files = len(paths)
    repo_of_arr = np.asarray(repo_of, dtype=np.int64)
    # first file index of each repo
    repo_start = np.zeros(spec.n_repos + 1, dtype=np.int64)
    np.cumsum(sizes, out=repo_start[1:])

    # ---- choose import targets (vectorized draws, per-file assembly) -----
    deg = 1 + rng.poisson(spec.mean_imports, size=n_files)
    total = int(deg.sum())
    u_kind = rng.random_sample(total)       # ghost / cross / intra
    u_tgt = rng.random_sample(total)
    cross_pick = open_repos[rng.choice(len(open_repos), size=total, p=hub_w)]

    edge_src: list[int] = []
    edge_dst: list[int] = []
    n_ghost = 0
    n_self = 0
    import_lines: list[list[str]] = []
    pos = 0
    for f in range(n_files):
        r = repo_of_arr[f]
        lang = repo_langs[r]
        lines = []
        for d in range(deg[f]):
            u, ut = u_kind[pos], u_tgt[pos]
            tr = cross_pick[pos]
            pos += 1
            if u < spec.p_ghost:
                g = int(ut * 1000)
                lines.append(_emit_import(lang, f"ghost.lib{g}.mod{g}", d))
                n_ghost += 1
                continue
            if u < spec.p_ghost + spec.p_cross and r not in isolated and tr != r:
                t = repo_start[tr] + int(ut * sizes[tr])
            else:
                t = repo_start[r] + int(ut * sizes[r])
            lines.append(_emit_import(lang, mods[t], d))
            if t == f:
                n_self += 1
            else:
                edge_src.append(f)
                edge_dst.append(t)
        import_lines.append(lines)

    # ---- seeded triangle motifs (per repo with >=3 files) ----------------
    for r in range(spec.n_repos):
        if sizes[r] < 3:
            continue
        a, b, c = repo_start[r], repo_start[r] + 1, repo_start[r] + 2
        lang = repo_langs[r]
        for s, t in ((a, b), (b, c), (a, c)):
            import_lines[s].append(_emit_import(lang, mods[t], 97))
            edge_src.append(s)
            edge_dst.append(t)

    # ---- content assembly ------------------------------------------------
    contents: list[str] = []
    for f in range(n_files):
        r = repo_of_arr[f]
        lang = repo_langs[r]
        filler = _FILLER[lang]
        body = "".join(filler.format(i=i) for i in range(3 + f % 5))
        contents.append(
            f"// {repo_names[r]} {paths[f]} generated seed={spec.seed}\n"
            + "\n".join(import_lines[f])
            + "\n\n" + body
        )

    repos_col = [repo_names[r] for r in repo_of_arr]
    commits_col = [repo_commits[r] for r in repo_of_arr]
    langs_col = [repo_langs[r] for r in repo_of_arr]

    # ---- malformed quarantine-bait rows (F5) -----------------------------
    mal_rows = spec.malformed_rows
    if mal_rows:
        for m in range(mal_rows):
            kind = m % 3
            repos_col.append(f"org0/badrepo{m}")
            paths.append(f"src/bad{m}.bin")
            commits_col.append("0" * 40)
            if kind == 0:       # empty content
                langs_col.append("python")
                contents.append("")
            elif kind == 1:     # unknown language
                langs_col.append("cobol")
                contents.append("IDENTIFICATION DIVISION.\n")
            else:               # binary garbage
                langs_col.append("c")
                contents.append("\x00\x01\xff\xfe garbage \x00" * 10)

    corpus = pa.table({
        "repo": pa.array(repos_col, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits_col, pa.string()),
        "lang": pa.array(langs_col, pa.string()),
        "content": pa.array(contents, pa.large_string()),
    })

    # ---- symbol table (F2) and golden edges (F3) -------------------------
    modules = pa.table({
        "module": pa.array(mods, pa.string()),
        "repo": pa.array([repo_names[r] for r in repo_of_arr[:n_files]], pa.string()),
        "path": pa.array(paths[:n_files], pa.string()),
    })

    vids = np.fromiter(
        (hash64_one(f"{repo_names[repo_of_arr[i]]}/{paths[i]}") for i in range(n_files)),
        dtype=np.int64, count=n_files)
    rids = np.fromiter((hash64_one(rn) for rn in repo_names), dtype=np.int64,
                       count=spec.n_repos)

    es = np.asarray(edge_src, dtype=np.int64)
    ed = np.asarray(edge_dst, dtype=np.int64)
    pair = np.stack([es, ed], axis=1)
    pair, mult = np.unique(pair, axis=0, return_counts=True)
    es, ed = pair[:, 0], pair[:, 1]
    edges_file = pa.table({
        "src": pa.array(vids[es], pa.int64()),
        "dst": pa.array(vids[ed], pa.int64()),
        "src_repo": pa.array([repo_names[r] for r in repo_of_arr[es]], pa.string()),
        "dst_repo": pa.array([repo_names[r] for r in repo_of_arr[ed]], pa.string()),
        # exact duplicate-import count (one per resolving import statement)
        "multiplicity": pa.array(mult.astype(np.int64), pa.int64()),
    })
    rs, rd = repo_of_arr[es], repo_of_arr[ed]
    keep = rs != rd
    # repo multiplicity = number of DISTINCT file-level edges between the pair
    rpair, rmult = np.unique(np.stack([rs[keep], rd[keep]], axis=1), axis=0,
                             return_counts=True)
    edges_repo = pa.table({
        "src": pa.array(rids[rpair[:, 0]], pa.int64()),
        "dst": pa.array(rids[rpair[:, 1]], pa.int64()),
        "src_repo": pa.array([repo_names[i] for i in rpair[:, 0]], pa.string()),
        "dst_repo": pa.array([repo_names[i] for i in rpair[:, 1]], pa.string()),
        "multiplicity": pa.array(rmult.astype(np.int64), pa.int64()),
    })

    # ---- per-file golden table (vertex ids + quarantine verdicts) --------
    all_vids = np.concatenate([
        vids,
        np.fromiter((hash64_one(f"{r}/{p}") for r, p in
                     zip(repos_col[n_files:], paths[n_files:])),
                    dtype=np.int64, count=len(repos_col) - n_files)])
    quarantined = np.zeros(len(repos_col), dtype=bool)
    quarantined[n_files:] = True    # every malformed row trips validation
    files_tbl = pa.table({
        "repo": pa.array(repos_col, pa.string()),
        "path": pa.array(paths, pa.string()),
        "vertex_id": pa.array(all_vids, pa.int64()),
        "quarantined": pa.array(quarantined),
    })

    # ---- graph-algorithm goldens via independent oracles -----------------
    components_tbl = labels_tbl = triangles_tbl = pagerank_tbl = None
    if spec.graph_goldens:
        gsrc, gdst = vids[es], vids[ed]
        components_tbl, triangles_tbl = _nx_goldens(vids, gsrc, gdst)
        labels_tbl = _lpa_golden(vids, gsrc, gdst, max_iter=30)
        pagerank_tbl = _pagerank_golden(vids, gsrc, gdst)

    stats = {
        "n_files": n_files,
        "n_repos": spec.n_repos,
        "n_import_stmts": total + 3 * int((sizes >= 3).sum()),
        "n_ghost_imports": n_ghost,
        "n_self_imports": n_self,
        "n_edges_file": edges_file.num_rows,
        "n_edges_repo": edges_repo.num_rows,
        "n_malformed_rows": mal_rows,
    }
    return GeneratedCorpus(spec, corpus, modules, edges_file, edges_repo,
                           files_tbl, components_tbl, labels_tbl,
                           triangles_tbl, pageranks=pagerank_tbl, stats=stats)


# --------------------------------------------------------------------------
# golden graph-algorithm outputs, via oracles INDEPENDENT of the Ray engine:
# NetworkX for components/triangles (the same oracle tests/test_graph.py
# trusts), and a direct dict/Counter transcription of the documented LPA
# spec (graph/runner.py label_propagation docstring) for labels. These back
# the driver's DuckDB twins (read_parquet over the golden files).
# --------------------------------------------------------------------------

def _nx_goldens(vids: np.ndarray, src: np.ndarray, dst: np.ndarray):
    """(components, triangles) golden tables over the undirected view."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(int(v) for v in vids)
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    comp_of = {}
    for comp in nx.connected_components(g):
        rep = min(comp)
        for v in comp:
            comp_of[v] = rep
    order = np.sort(vids)
    components = pa.table({
        "v": pa.array(order, pa.int64()),
        "component": pa.array([comp_of[int(v)] for v in order], pa.int64()),
    })
    tri = nx.triangles(g)
    tv = sorted(v for v, t in tri.items() if t > 0)
    triangles = pa.table({
        "v": pa.array(tv, pa.int64()),
        "triangles": pa.array([tri[v] for v in tv], pa.int64()),
    })
    return components, triangles


def _pagerank_golden(vids: np.ndarray, src: np.ndarray, dst: np.ndarray, *,
                     alpha: float = 0.85, n_iter: int = 150) -> pa.Table:
    """PageRank golden: the NetworkX power-iteration formulation transcribed
    straight-line in float64 numpy (x' = a*(inc + dangle/N) + (1-a)/N over
    the deduped directed edges), run for a FIXED n_iter on both sides — a
    fixed count (a^150 residual ~3e-11, far under the 1e-6 rounding
    quantum) makes the engine/golden comparison deterministic to float
    noise, with no convergence-threshold race at rounding boundaries."""
    order = np.sort(vids)
    n = len(order)
    si = np.searchsorted(order, src)
    di = np.searchsorted(order, dst)
    outdeg = np.bincount(si, minlength=n).astype(np.float64)
    safe = np.where(outdeg > 0, outdeg, 1.0)
    dangling = outdeg == 0
    x = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(n_iter):
        contrib = x / safe
        inc = np.bincount(di, weights=contrib[si], minlength=n)
        base = (alpha * x[dangling].sum() + (1.0 - alpha)) / n
        x = alpha * inc + base
    return pa.table({"v": pa.array(order, pa.int64()),
                     "rank": pa.array(np.round(x, 6), pa.float64())})


def _lpa_golden(vids: np.ndarray, src: np.ndarray, dst: np.ndarray,
                max_iter: int = 30) -> pa.Table:
    """Deterministic synchronous label propagation, per the engine's
    documented spec: neighbor sets from the deduped undirected edges, each
    round every vertex adopts the most frequent neighbor label (ties -> the
    smallest label), isolated vertices keep theirs; fixpoint or max_iter."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    verts = [int(v) for v in np.sort(vids)]
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            nb = adj[v]
            if not nb:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in nb)
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if new == labels:
            break
        labels = new
    return pa.table({
        "v": pa.array(verts, pa.int64()),
        "label": pa.array([labels[v] for v in verts], pa.int64()),
    })


# --------------------------------------------------------------------------
# on-disk cache: /tmp/metis_ray_corpus/<scale>/{corpus/,modules.parquet,...}
# Idempotent by manifest, mirroring the reference's "already imported =>
# nothing to do" contract (Metis/tools/HDF5Helper.py:53-69).
# --------------------------------------------------------------------------

CACHE_ROOT = os.environ.get("METIS_RAY_CORPUS_DIR", "/tmp/metis_ray_corpus")

# bump when the generator's output (incl. id hashing) changes so stale caches
# regenerate — the "already imported => skip" check must also detect
# format drift (the reference scaffolds exactly this with its disabled sha256
# compare, HDF5Helper.py:58-68).
_FORMAT_VERSION = 4


def materialize_scale(scale: str | CorpusSpec, root: str = CACHE_ROOT) -> str:
    """Generate (once) and return the on-disk directory for a corpus scale.

    Layout: ``<root>/<name>/corpus/part-*.parquet`` (multiple part files so
    ``read_parquet`` fans out), plus ``modules.parquet``,
    ``golden_edges_file.parquet``, ``golden_edges_repo.parquet``,
    ``manifest.json``. A complete manifest short-circuits regeneration.
    """
    spec = SCALES[scale] if isinstance(scale, str) else scale
    out = os.path.join(root, spec.name)
    man = os.path.join(out, "manifest.json")
    if os.path.exists(man):
        with open(man) as fh:
            m = json.load(fh)
        if (m.get("seed") == spec.seed and m.get("fmt") == _FORMAT_VERSION
                and m.get("n_files_requested") == spec.n_files):
            return out

    gen = generate(spec)
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "corpus"), exist_ok=True)
    n = gen.corpus.num_rows
    per = spec.files_per_part
    for i, lo in enumerate(range(0, n, per)):
        pq.write_table(gen.corpus.slice(lo, per),
                       os.path.join(tmp, "corpus", f"part-{i:05d}.parquet"),
                       row_group_size=8192)
    pq.write_table(gen.modules, os.path.join(tmp, "modules.parquet"))
    pq.write_table(gen.edges_file, os.path.join(tmp, "golden_edges_file.parquet"))
    pq.write_table(gen.edges_repo, os.path.join(tmp, "golden_edges_repo.parquet"))
    pq.write_table(gen.files, os.path.join(tmp, "golden_files.parquet"))
    for name, tbl in (("components", gen.components), ("labels", gen.labels),
                      ("triangles", gen.triangles), ("pagerank", gen.pageranks)):
        if tbl is not None:
            pq.write_table(tbl, os.path.join(tmp, f"golden_{name}.parquet"))
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump({"seed": spec.seed, "fmt": _FORMAT_VERSION,
                   "n_files_requested": spec.n_files, **gen.stats}, fh, indent=1)
    if os.path.exists(out):
        import shutil
        shutil.rmtree(out)
    os.replace(tmp, out)
    return out


def corpus_dir_for_sf(sf_dir: str) -> str:
    return materialize_scale(scale_for_sf_dir(sf_dir))
