#!/usr/bin/env bash
# Launch the link-graph pipeline as a Ray JOB on a running cluster
# (the north-rule launch path: `ray job submit` at cluster sizes N and 4N):
#
#   RAY_ADDRESS=http://<head>:8265 jobs/submit_graph.sh CORPUS WORKDIR [ALGO] [P] [CKPT]
#
# The job runs the same CLI entry point used everywhere else
# (`python -m metis_ray.cli graph`), so local runs, tests and cluster jobs
# share one code path. `ray job submit` talks to the dashboard agent; this
# sandbox starts Ray with include_dashboard=False, so in-sandbox the
# equivalent direct invocation is:
#
#   python -m metis_ray.cli graph --corpus CORPUS --workdir WORKDIR \
#       --algo pagerank --p 32 [--ckpt DIR --resume]
#
set -euo pipefail
corpus="${1:?corpus dir}"; workdir="${2:?workdir}"
algo="${3:-pagerank}"; p="${4:-32}"; ckpt="${5:-}"
exec ray job submit --working-dir "$(dirname "$0")/.." -- \
  python -m metis_ray.cli graph --corpus "$corpus" --workdir "$workdir" \
  --algo "$algo" --p "$p" ${ckpt:+--ckpt "$ckpt" --resume}
