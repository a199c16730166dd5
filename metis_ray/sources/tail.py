"""Record-granular tail-follow of a GROWING line-framed file (the
sub-fragment-latency analogue of the reference's live source, S2).

The reference tails a file WHILE its producer writes it and surfaces each
new record within about a second of landing (the inotify/GStreamer tail in
Metis/python/metis_source.py:173-233; "1 second after a tester finishes",
Metis/README.md:36-38). Parquet cannot be tailed — the footer is written
last, so a growing parquet file is unreadable by design — which is why the
repo's incremental unit is the immutable fragment (pipelines/incremental.py).
THIS module restores record-granular latency for line-framed producers
(JSONL, one corpus row per line):

* a tailer tracks the byte offset of the last COMPLETE record (framing =
  ``\\n``; a partial trailing line simply waits for more bytes),
* each poll converts the newly-completed lines into a normal immutable
  parquet fragment in the corpus dir — named deterministically by the
  byte range it covers, so a crash between fragment write and state commit
  re-lands the SAME fragment name and the retry skips it (exactly-once),
* the standard incremental manifest machinery (``ingest_increment`` /
  ``watch``) takes over from there.

End-to-end latency = poll interval + one increment, independent of when the
producer closes the file. The growing file itself lives OUTSIDE the corpus
dir; only closed fragments enter it, so the immutable-fragment contract is
never violated. The tail state is per-file and byte-offset-only — the
producer contract is APPEND-ONLY (truncation/rewrite raises, mirroring the
fragment immutability error).

Scale shape: one tailer per growing file is inherently serial (so is the
reference's per-file daemon); fleet scale comes from many files, each
tailed independently — the watcher can spawn one ``tail_follow`` per
producer and every landed fragment flows through the same distributed
ingest.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

#: corpus row fields (sources/parquet.py::read_corpus); absent keys are
#: landed as "" — the order-free default-imputation contract (M11)
CORPUS_FIELDS = ("repo", "path", "commit", "lang", "content")


def _state_path(state_dir: str, src_path: str) -> str:
    key = hashlib.sha256(os.path.abspath(src_path).encode()).hexdigest()[:16]
    return os.path.join(state_dir, f"tail-{key}.json")


def _load_state(state_dir: str, src_path: str) -> dict:
    p = _state_path(state_dir, src_path)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {"src": os.path.abspath(src_path), "offset": 0,
            "records": 0, "bad_records": 0}


def _commit_state(state_dir: str, src_path: str, st: dict) -> None:
    p = _state_path(state_dir, src_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(st, fh)
    os.replace(tmp, p)


def _frag_dir(corpus_dir: str) -> str:
    d = os.path.join(corpus_dir, "corpus")
    return d if os.path.isdir(d) else corpus_dir


def _rows_table(lines: list[bytes]) -> tuple[pa.Table, int]:
    """Parse complete JSONL lines into a typed corpus table; a complete
    line that is not valid JSON is producer corruption — counted and
    skipped (the content-level quarantine lives downstream in
    stages/validate.py; framing corruption never enters the corpus)."""
    cols: dict[str, list] = {f: [] for f in CORPUS_FIELDS}
    bad = 0
    for ln in lines:
        if not ln.strip():
            continue
        try:
            rec = json.loads(ln)
            if not isinstance(rec, dict):
                raise ValueError("not an object")
        except Exception:                                  # noqa: BLE001
            bad += 1
            continue
        for f in CORPUS_FIELDS:
            v = rec.get(f)
            # explicit JSON null == absent key: both land as "" (M11),
            # never the literal string "None"
            cols[f].append(v if isinstance(v, str)
                           else "" if v is None else str(v))
    return pa.table({f: pa.array(cols[f], pa.string())
                     for f in CORPUS_FIELDS}), bad


def tail_once(src_path: str, corpus_dir: str, state_dir: str) -> dict:
    """One poll: land every line completed since the last committed offset
    as one immutable parquet fragment. Returns
    ``{new_records, bad_records, fragment|None, offset}``."""
    os.makedirs(state_dir, exist_ok=True)
    st = _load_state(state_dir, src_path)
    offset = int(st["offset"])
    if not os.path.exists(src_path):
        if offset > 0:
            raise ValueError(
                f"{src_path} vanished below the committed tail offset "
                f"{offset}: the tail contract is append-only")
        # daemon started before the producer's first open(): wait
        return {"new_records": 0, "bad_records": 0, "fragment": None,
                "offset": offset}
    size = os.path.getsize(src_path)
    # exactly-once across crash retries: if a PREVIOUS poll wrote a
    # fragment starting at this offset but died before committing state,
    # re-cover exactly that byte range (append-only => those bytes are
    # unchanged), so the name collides, the write is skipped, and the
    # state commit below completes the interrupted poll. Without this
    # clamp, bytes appended between the crash and the retry would widen
    # the range, mint a NEW fragment name, and duplicate the records.
    stem = hashlib.sha256(os.path.abspath(src_path).encode()).hexdigest()[:8]
    fdir = _frag_dir(corpus_dir)
    prefix = f"tail-{stem}-{offset:014d}-"
    if os.path.isdir(fdir):
        pend = [f for f in os.listdir(fdir)
                if f.startswith(prefix) and f.endswith(".parquet")]
        if pend:
            size = min([size] + [int(f[len(prefix):-len(".parquet")])
                                 for f in pend])
    if size < offset:
        raise ValueError(
            f"{src_path} shrank below the committed tail offset "
            f"({size} < {offset}): the tail contract is append-only")
    if size == offset:
        return {"new_records": 0, "bad_records": 0, "fragment": None,
                "offset": offset}
    with open(src_path, "rb") as fh:
        fh.seek(offset)
        buf = fh.read(size - offset)
    cut = buf.rfind(b"\n")
    if cut < 0:        # no record completed yet — wait for more bytes
        return {"new_records": 0, "bad_records": 0, "fragment": None,
                "offset": offset}
    chunk = buf[:cut + 1]
    tbl, bad = _rows_table(chunk.splitlines())

    end = offset + cut + 1
    frag = f"tail-{stem}-{offset:014d}-{end:014d}.parquet"
    os.makedirs(fdir, exist_ok=True)
    fpath = os.path.join(fdir, frag)
    if not os.path.exists(fpath):      # crash retry lands the same name
        tmp = fpath + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, fpath)
    st["offset"] = end
    st["records"] = int(st["records"]) + tbl.num_rows
    st["bad_records"] = int(st["bad_records"]) + bad
    _commit_state(state_dir, src_path, st)
    return {"new_records": tbl.num_rows, "bad_records": bad,
            "fragment": frag, "offset": end}


def tail_follow(src_path: str, corpus_dir: str, state_dir: str, *,
                interval: float = 1.0, stop_file: str | None = None,
                max_polls: int | None = None, on_land=None) -> dict:
    """Poll ``src_path`` until ``stop_file`` appears (or ``max_polls``):
    the live-source daemon loop, mirroring ``incremental.watch``. After a
    poll that landed a fragment, ``on_land(info)`` runs — chain
    ``ingest_increment`` there for tail→ingest latency of one interval.
    Returns the cumulative tail state."""
    import time

    polls = 0
    while True:
        if stop_file is not None and os.path.exists(stop_file):
            break
        info = tail_once(src_path, corpus_dir, state_dir)
        if info["fragment"] is not None and on_land is not None:
            on_land(info)
        polls += 1
        if max_polls is not None and polls >= max_polls:
            break
        time.sleep(interval)
    return _load_state(state_dir, src_path)
