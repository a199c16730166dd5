"""CLI driver smoke (subprocess: the CLI owns its own Ray session)."""

import json
import os
import subprocess
import sys


def test_cli_graph_end_to_end(tiny_corpus_dir, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "metis_ray.cli", "--num-cpus", "4", "graph",
         "--corpus", tiny_corpus_dir, "--workdir", str(tmp_path),
         "--algo", "components", "--p", "4"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["converged"] is True
    assert os.path.exists(os.path.join(res["result"], "part-0.parquet"))


def test_cli_watch_and_backup(tiny_corpus_dir, tmp_path):
    """watch verb lands fragments and exits on --max-loops; ingest --backup
    writes the lossless raw table."""
    import shutil

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    cd = str(tmp_path / "c")
    os.makedirs(os.path.join(cd, "corpus"))
    for f in os.listdir(os.path.join(tiny_corpus_dir, "corpus")):
        shutil.copy(os.path.join(tiny_corpus_dir, "corpus", f),
                    os.path.join(cd, "corpus", f))
    state = str(tmp_path / "s")
    out = subprocess.run(
        [sys.executable, "-m", "metis_ray.cli", "--num-cpus", "4", "watch",
         "--corpus", cd, "--state", state, "--interval", "0.1",
         "--max-loops", "2"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["watch"]["fragments"] == 1 and res["watch"]["edges"] > 0

    bdir = str(tmp_path / "bk")
    out2 = subprocess.run(
        [sys.executable, "-m", "metis_ray.cli", "--num-cpus", "4", "ingest",
         "--corpus", tiny_corpus_dir, "--out", str(tmp_path / "o"),
         "--backup", bdir],
        env=env, capture_output=True, text=True, timeout=300)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert os.path.exists(os.path.join(bdir, "_MANIFEST.json"))


def test_cli_query_verb(tmp_path):
    """`query` runs a registered pipeline, lands Parquet with a manifest,
    and skips idempotently on re-run."""
    import json
    import os

    import pyarrow.parquet as pq

    from metis_ray.cli import main

    out = str(tmp_path / "q_out")
    rc = main(["query", "--name", "docs_token_count",
               "--sf-dir", "/root/testdata/sf0.001", "--out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "_SUCCESS.json"))
    t = pq.read_table(out)
    assert t.num_rows == 500 and "n_tokens" in t.column_names

    mtime = os.path.getmtime(os.path.join(out, "_SUCCESS.json"))
    rc = main(["query", "--name", "docs_token_count",
               "--sf-dir", "/root/testdata/sf0.001", "--out", out])
    assert rc == 0
    assert os.path.getmtime(os.path.join(out, "_SUCCESS.json")) == mtime

    rc = main(["query", "--name", "no_such_query",
               "--sf-dir", "/root/testdata/sf0.001",
               "--out", str(tmp_path / "q2")])
    assert rc == 2
