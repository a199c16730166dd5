"""functions/json.py kernel edge cases + sequential oracles for the two
round-5 late operators (events_props_stats, emb_knn_classify)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# parse_json_column / json_field kernel


def test_json_field_basic_alignment():
    from metis_ray.functions.json import json_field
    col = pa.array(['{"k": 1}', '{"k": 2, "x": "a"}', "{}", None,
                    "   ", '{"k": -7}'])
    out = json_field(col, "k", type=pa.int64())
    assert out.to_pylist() == [1, 2, None, None, None, -7]


def test_json_field_missing_key_everywhere():
    from metis_ray.functions.json import json_field
    col = pa.array(["{}", '{"x": 1}'])
    out = json_field(col, "nope", type=pa.int64())
    assert out.to_pylist() == [None, None]


def test_parse_json_column_types_and_strings():
    from metis_ray.functions.json import parse_json_column
    col = pa.array(['{"a": 1.5, "b": "hi"}', '{"a": 2.0}'])
    t = parse_json_column(col)
    assert t.num_rows == 2
    assert t["a"].to_pylist() == [1.5, 2.0]
    assert t["b"].to_pylist() == ["hi", None]


def test_parse_json_column_newline_violation_raises():
    from metis_ray.functions.json import parse_json_column
    # a literal newline INSIDE a value breaks NDJSON framing -> loud error,
    # never silent row misalignment
    col = pa.array(['{"a": "x\ny"}', '{"a": "z"}'])
    with pytest.raises(ValueError):
        parse_json_column(col)


def test_parse_json_column_invalid_json_raises():
    from metis_ray.functions.json import parse_json_column
    with pytest.raises(ValueError):
        parse_json_column(pa.array(["not json", "{}"]))


def test_parse_json_column_empty_and_chunked():
    from metis_ray.functions.json import parse_json_column
    assert parse_json_column(pa.array([], pa.string())).num_rows == 0
    ch = pa.chunked_array([pa.array(['{"k": 1}']), pa.array(['{"k": 2}'])])
    assert parse_json_column(ch)["k"].to_pylist() == [1, 2]


# --------------------------------------------------------------------------
# events_props_stats: DuckDB json_extract twin at sf0.001


def test_events_props_stats_matches_duckdb(ray_session):
    from metis_ray.pipelines.relational import events_props_stats
    df = (events_props_stats(SF).to_pandas()
          .sort_values("event_type").reset_index(drop=True))
    sdf = duckdb.sql(f"""
        SELECT event_type, COUNT(*)::BIGINT AS n,
               SUM(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
               MIN(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS min_k,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS max_k
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY event_type ORDER BY event_type""").df()
    pd.testing.assert_frame_equal(
        df[["event_type", "n", "sum_k", "min_k", "max_k"]], sdf)


# --------------------------------------------------------------------------
# emb_knn_classify: sequential numpy transcription oracle


def test_knn_classify_matches_sequential(ray_session):
    from metis_ray.pipelines.similarity import knn_classify
    got = knn_classify(SF, k=10, n_queries=20)

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    m = np.vstack([np.asarray(v, np.float64) for v in emb["embedding"]])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    labs = emb["label"].to_numpy()
    rows = []
    for qi in range(20):
        sims = m[qi] @ m.T
        sims[qi] = -np.inf                       # exclude self
        order = np.lexsort((ids, -sims))[:10]    # sim desc, id asc
        vote = pd.Series(labs[order]).value_counts()
        # majority, tie -> smallest label
        best = sorted(vote.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rows.append({"query_id": int(ids[qi]), "pred_label": int(best[0]),
                     "votes": int(best[1])})
    want = pd.DataFrame(rows).astype(np.int64)
    want["query_id"] = want["query_id"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
