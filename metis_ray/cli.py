"""CLI driver — the ``stdf2ph5 main()`` analogue (reference S6:
``Metis/tools/stdf2ph5.py:575-608``: validate args -> convert -> report).

    python -m metis_ray.cli ingest  --corpus DIR --out DIR
    python -m metis_ray.cli graph   --corpus DIR --workdir DIR --algo pagerank
                                    [--p 8] [--ckpt DIR] [--resume]
    python -m metis_ray.cli bench-graph --sf-dir DIR --p 8

Owns its Ray session (guarded init, shutdown at exit) — library code never
does (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    return ray


def cmd_ingest(args) -> int:
    ray = _ray_session(args.num_cpus)
    from metis_ray.pipelines.linkgraph import backup_corpus, ingest
    if args.backup:
        backup_corpus(args.corpus, args.backup)
    res = ingest(args.corpus, collect_stats=True,
                 resolve_strategy=args.resolve_strategy,
                 id_scheme=args.id_scheme)
    if res.dense_ids is not None:
        res.dense_ids.write_parquet(f"{args.out}/dense_ids")
    res.edges_file.write_parquet(f"{args.out}/edges_file")
    res.edges_repo.write_parquet(f"{args.out}/edges_repo")
    res.files.write_parquet(f"{args.out}/files")
    print(json.dumps({"stats": res.stats, "out": args.out}))
    ray.shutdown()
    return 0


def cmd_graph(args) -> int:
    ray = _ray_session(args.num_cpus)
    from metis_ray.graph import ALGORITHM_DIRECTED, run_algorithm
    from metis_ray.pipelines.linkgraph import build_linkgraph
    directed = ALGORITHM_DIRECTED[args.algo]
    gdir = build_linkgraph(args.corpus, args.workdir, args.p, directed=directed)
    kwargs = {}
    if args.ckpt:
        kwargs.update(ckpt_dir=args.ckpt, resume=args.resume)
    stats, table = run_algorithm(args.algo, gdir, **kwargs)
    out = f"{args.workdir}/result_{args.algo}"
    import pyarrow.parquet as pq
    import os
    os.makedirs(out, exist_ok=True)
    pq.write_table(table, f"{out}/part-0.parquet")
    print(json.dumps({
        "algorithm": stats.algorithm, "epochs": stats.epochs,
        "converged": stats.converged,
        "supersteps_per_sec": round(stats.supersteps_per_sec, 3),
        "edges": stats.total_edges, "vertices": stats.total_vertices,
        "result": out,
    }))
    ray.shutdown()
    return 0


def cmd_watch(args) -> int:
    """Arriving-input daemon (reference sinotify analogue): poll the corpus
    dir, land new fragments idempotently, stop on sentinel/max-loops."""
    ray = _ray_session(args.num_cpus)
    from metis_ray.pipelines.incremental import watch
    totals = watch(args.corpus, args.state, interval=args.interval,
                   max_loops=args.max_loops,
                   resolve_strategy=args.resolve_strategy,
                   on_batch=lambda info: print(json.dumps(info)))
    print(json.dumps({"watch": totals}))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    """Run any registered pipeline (``__ray_entry__.queries()`` name) over
    an sf dir and land the result as Parquet — the 'switch your pipeline to
    this repo' entry point. Idempotent: a completed output dir (manifest
    present) is skipped, so a re-run after failure does no work twice."""
    import os

    ray = _ray_session(args.num_cpus)
    try:
        manifest = os.path.join(args.out, "_SUCCESS.json")
        if os.path.exists(manifest):
            print(json.dumps({"query": args.name, "out": args.out,
                              "skipped": "already complete"}))
            return 0
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "_metis_entry", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        qs = mod.queries()
        if args.name not in qs:
            print(json.dumps({"error": f"unknown query '{args.name}'",
                              "available": sorted(qs)}), file=sys.stderr)
            return 2
        res = qs[args.name](args.sf_dir)
        tmp = args.out + ".tmp"
        import shutil
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            res.write_parquet(tmp)
            n = sum(1 for f in os.listdir(tmp) if f.endswith(".parquet"))
            rows = None
        else:
            import pyarrow as pa
            import pyarrow.parquet as pq
            table = (res if isinstance(res, pa.Table)
                     else pa.Table.from_pandas(res))
            pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
            n, rows = 1, table.num_rows
        with open(os.path.join(tmp, "_SUCCESS.json"), "w") as fh:
            json.dump({"query": args.name, "sf_dir": args.sf_dir,
                       "files": n, "rows": rows}, fh)
        if os.path.exists(args.out):
            shutil.rmtree(args.out)
        os.replace(tmp, args.out)
        print(json.dumps({"query": args.name, "out": args.out, "files": n,
                          "rows": rows}))
        return 0
    finally:
        # a failing query callable must not leak the Ray session (in-process
        # callers like tests/test_cli.py would inherit the orphaned cluster)
        ray.shutdown()


def cmd_bench_graph(args) -> int:
    ray = _ray_session(args.num_cpus)
    from metis_ray.benchgraph import bench_graph_dir
    g = bench_graph_dir(args.sf_dir, args.p)
    print(json.dumps({"graph_dir": g}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="metis_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("ingest", help="corpus -> files + edge tables")
    p1.add_argument("--corpus", required=True)
    p1.add_argument("--out", required=True)
    p1.add_argument("--backup", default=None,
                    help="also land the verbatim corpus (lossless raw backup)")
    p1.add_argument("--resolve-strategy", choices=["broadcast", "join"],
                    default="broadcast")
    p1.add_argument("--id-scheme", choices=["hash", "dense"], default="hash",
                    help="'dense' = rank-of-128-bit-digest vertex ids "
                         "(collision-free past the 63-bit birthday bound; "
                         "implies join resolution)")
    p1.set_defaults(fn=cmd_ingest)

    p2 = sub.add_parser("graph", help="run a graph algorithm end-to-end")
    p2.add_argument("--corpus", required=True)
    p2.add_argument("--workdir", required=True)
    p2.add_argument("--algo", choices=["pagerank", "components", "labelprop"],
                    default="pagerank")
    p2.add_argument("--p", type=int, default=8)
    p2.add_argument("--ckpt", default=None)
    p2.add_argument("--resume", action="store_true")
    p2.set_defaults(fn=cmd_graph)

    p4 = sub.add_parser(
        "watch",
        help="poll a corpus dir, land new fragments (a fragment is landed "
             "once its size is stable across two polls; rename-into-place "
             "arrival is still the recommended producer contract)")
    p4.add_argument("--corpus", required=True)
    p4.add_argument("--state", required=True)
    p4.add_argument("--interval", type=float, default=1.0)
    p4.add_argument("--max-loops", type=int, default=None)
    p4.add_argument("--resolve-strategy", choices=["broadcast", "join"],
                    default="broadcast",
                    help="'join' keeps the symbol table a Dataset end-to-end "
                         "(for symbol tables beyond one node's memory)")
    p4.set_defaults(fn=cmd_watch)

    p5 = sub.add_parser(
        "query", help="run a registered pipeline by name, land Parquet "
                      "(idempotent: completed outputs are skipped)")
    p5.add_argument("--name", required=True)
    p5.add_argument("--sf-dir", required=True)
    p5.add_argument("--out", required=True)
    p5.set_defaults(fn=cmd_query)

    p3 = sub.add_parser("bench-graph", help="materialize a bench graph")
    p3.add_argument("--sf-dir", required=True)
    p3.add_argument("--p", type=int, default=8)
    p3.set_defaults(fn=cmd_bench_graph)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
