"""Record-granular tail-follow (sources/tail.py): a growing JSONL file
lands as immutable fragments, exactly-once, and the tailed corpus ingests
to the SAME edge set as the one-shot batch build."""

import json
import os

import pyarrow.parquet as pq

from metis_ray.pipelines.incremental import edges_so_far, ingest_increment
from metis_ray.pipelines.linkgraph import ingest
from metis_ray.sources.tail import tail_once
from metis_ray.sources.parquet import read_corpus


def _corpus_jsonl_lines(tiny_corpus_dir):
    rows = read_corpus(tiny_corpus_dir).to_pandas().to_dict("records")
    return [(json.dumps(r) + "\n").encode() for r in rows]


def test_tail_lands_complete_records_only(tiny_corpus_dir, tmp_path):
    lines = _corpus_jsonl_lines(tiny_corpus_dir)[:5]
    src = str(tmp_path / "producer.jsonl")
    cd = str(tmp_path / "corpus_tail")
    state = str(tmp_path / "tailstate")
    os.makedirs(os.path.join(cd, "corpus"))

    # producer writes 2 full lines + a PARTIAL third
    with open(src, "wb") as fh:
        fh.write(lines[0] + lines[1] + lines[2][:10])
    info = tail_once(src, cd, state)
    assert info["new_records"] == 2 and info["fragment"] is not None
    frag1 = os.path.join(cd, "corpus", info["fragment"])
    assert pq.read_table(frag1).num_rows == 2

    # nothing new completed -> no-op (partial line still pending)
    assert tail_once(src, cd, state)["new_records"] == 0

    # the rest of line 3 + two more lines arrive
    with open(src, "ab") as fh:
        fh.write(lines[2][10:] + lines[3] + lines[4])
    info2 = tail_once(src, cd, state)
    assert info2["new_records"] == 3

    # crash between fragment write and state commit: rewind the state and
    # re-poll — the deterministic byte-range name makes the retry land the
    # SAME fragment (skipped, offset recommitted), never a duplicate
    sp = [p for p in os.listdir(state) if p.endswith(".json")][0]
    stf = os.path.join(state, sp)
    st = json.load(open(stf))
    st["offset"] = info["offset"]          # pretend the 2nd commit was lost
    json.dump(st, open(stf, "w"))
    frags_before = sorted(os.listdir(os.path.join(cd, "corpus")))
    info3 = tail_once(src, cd, state)
    assert sorted(os.listdir(os.path.join(cd, "corpus"))) == frags_before
    assert info3["fragment"] == info2["fragment"]

    # truncation violates the append-only contract loudly
    with open(src, "wb") as fh:
        fh.write(b"{}\n")
    try:
        tail_once(src, cd, state)
        raise AssertionError("truncation must raise")
    except ValueError as e:
        assert "append-only" in str(e)


def test_tailed_corpus_matches_batch_ingest(tiny_corpus_dir, tmp_path):
    """Grow the producer file in 3 stages, tailing + ingesting after each;
    the union of increments equals the one-shot batch edge set — the same
    convergence contract as fragment-granular arrival, now at record
    granularity."""
    lines = _corpus_jsonl_lines(tiny_corpus_dir)
    src = str(tmp_path / "producer.jsonl")
    cd = str(tmp_path / "corpus_tail")
    state_tail = str(tmp_path / "tailstate")
    state_ing = str(tmp_path / "ingstate")
    os.makedirs(os.path.join(cd, "corpus"))

    open(src, "wb").close()
    thirds = [len(lines) // 3, 2 * len(lines) // 3, len(lines)]
    start = 0
    for end in thirds:
        with open(src, "ab") as fh:
            fh.write(b"".join(lines[start:end]))
        start = end
        if tail_once(src, cd, state_tail)["fragment"] is not None:
            ingest_increment(cd, state_ing)

    inc = edges_so_far(state_ing).to_pandas()
    batch = ingest(tiny_corpus_dir).edges_file.to_pandas()
    assert set(zip(inc["src"], inc["dst"])) == set(zip(batch["src"],
                                                       batch["dst"]))


def test_crash_retry_with_concurrent_append_no_duplicates(tmp_path):
    """Crash between fragment write and state commit, then MORE bytes
    arrive before the retry: the retry must complete the interrupted poll
    (same fragment name, no rewrite) — never mint a wider fragment that
    duplicates the already-landed records."""
    src = str(tmp_path / "p.jsonl")
    cd = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    os.makedirs(os.path.join(cd, "corpus"))
    rec = lambda i: (json.dumps(  # noqa: E731
        {"repo": "r", "path": f"f{i}.py", "commit": "c", "lang": "python",
         "content": f"# {i}"}) + "\n").encode()
    with open(src, "ab") as fh:
        fh.write(rec(0) + rec(1))
    out1 = tail_once(src, cd, state)
    assert out1["new_records"] == 2
    # simulate the crash: roll the committed state back to offset 0
    # (fragment written, commit lost)
    stfile = [f for f in os.listdir(state) if f.endswith(".json")][0]
    with open(os.path.join(state, stfile)) as fh:
        st = json.load(fh)
    st["offset"] = 0; st["records"] = 0
    with open(os.path.join(state, stfile), "w") as fh:
        json.dump(st, fh)
    # producer appends between crash and retry
    with open(src, "ab") as fh:
        fh.write(rec(2))
    out2 = tail_once(src, cd, state)       # retry completes the OLD poll
    assert out2["fragment"] == out1["fragment"]
    out3 = tail_once(src, cd, state)       # next poll lands only rec 2
    assert out3["new_records"] == 1
    frags = sorted(f for f in os.listdir(os.path.join(cd, "corpus"))
                   if f.endswith(".parquet"))
    assert len(frags) == 2
    total = sum(pq.read_table(os.path.join(cd, "corpus", f)).num_rows
                for f in frags)
    assert total == 3                      # nothing duplicated


def test_tail_waits_for_producer_file(tmp_path):
    """A tailer started before the producer's first open() waits instead
    of dying; once offset is committed, a vanished file raises."""
    src = str(tmp_path / "notyet.jsonl")
    cd = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    out = tail_once(src, cd, state)
    assert out == {"new_records": 0, "bad_records": 0, "fragment": None,
                   "offset": 0}
    with open(src, "wb") as fh:
        fh.write(b'{"repo":"r","path":"a.py","commit":"c",'
                 b'"lang":"python","content":"x"}\n')
    assert tail_once(src, cd, state)["new_records"] == 1
    os.remove(src)
    try:
        tail_once(src, cd, state)
        assert False, "vanished file must raise"
    except ValueError as e:
        assert "append-only" in str(e)


def test_tail_null_fields_land_as_empty(tmp_path):
    """Explicit JSON null == absent key: both impute to '' (M11), never
    the literal string 'None'."""
    src = str(tmp_path / "p.jsonl")
    cd = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    os.makedirs(os.path.join(cd, "corpus"))
    with open(src, "wb") as fh:
        fh.write(b'{"repo": null, "path": "a.py", "commit": "c", '
                 b'"lang": "python", "content": "x"}\n')
    out = tail_once(src, cd, state)
    t = pq.read_table(os.path.join(cd, "corpus", out["fragment"]))
    assert t["repo"].to_pylist() == [""]
