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
