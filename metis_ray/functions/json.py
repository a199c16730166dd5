"""Arrow-native extraction of fields from a string column of JSON objects.

The reference infers structure out of string columns at load time
(SURVEY §2.2 M7, ``Metis/tools/CSVHelper.py`` string-column inference);
here the semi-structured column stays an opaque string until a pipeline
asks for fields, and extraction is ONE C++ NDJSON parse per batch — no
Python loop over rows, no per-row ``json.loads``.

Mechanism: null/blank rows are replaced with ``{}`` (SQL
``json_extract`` null semantics), the whole batch is joined into a
single newline-framed buffer with ``pyarrow.compute.binary_join``
(zero-copy slice of the joined array's value buffer), and that buffer is
handed to ``pyarrow.json.read_json`` — the same multithreaded C++ parser
Arrow uses for ``.jsonl`` files.  The output table is row-aligned with
the input column.

Framing assumption (documented, asserted): the JSON objects contain no
literal newline bytes — true for any machine-written single-object
column (NDJSON framing).  A row that violates it changes the row count
and raises rather than silently mis-aligning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj

__all__ = ["parse_json_column", "json_field"]


def parse_json_column(col: pa.Array | pa.ChunkedArray,
                      *, schema: pa.Schema | None = None) -> pa.Table:
    """Parse a string column of JSON objects into a flat ``pa.Table``
    (one column per top-level key), row-aligned with the input.

    Null / whitespace-only rows parse as ``{}`` → every field null for
    that row.  ``schema`` forces field types (otherwise Arrow infers).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.table({}) if schema is None else schema.empty_table()
    filled = pc.fill_null(col, "{}")
    blank = pc.equal(pc.utf8_trim_whitespace(filled), "")
    filled = pc.if_else(blank, pa.scalar("{}", filled.type), filled)
    # one list of all rows -> one newline-joined NDJSON buffer
    offsets = pa.array([0, n], pa.int64())
    wrapped = pa.LargeListArray.from_arrays(offsets, filled)
    joined = pc.binary_join(wrapped, "\n")       # length-1 string array
    bufs = joined.buffers()
    odt = np.int64 if pa.types.is_large_string(joined.type) else np.int32
    offs = np.frombuffer(bufs[1], odt, 2)
    view = bufs[2].slice(int(offs[0]), int(offs[1] - offs[0]))
    opts = pj.ParseOptions(explicit_schema=schema) if schema else None
    try:
        out = pj.read_json(pa.BufferReader(view), parse_options=opts)
    except pa.ArrowInvalid as e:
        raise ValueError(f"JSON column is not parseable as one object "
                         f"per row: {e}") from None
    if out.num_rows != n:
        raise ValueError(
            f"JSON column broke NDJSON framing (parsed {out.num_rows} "
            f"objects from {n} rows — a value contains a literal newline)")
    return out


def json_field(col: pa.Array | pa.ChunkedArray, field: str,
               *, type: pa.DataType | None = None) -> pa.Array:
    """Extract one top-level ``field`` from a JSON-object string column.

    Missing keys (and null / blank rows) yield nulls — the exact
    semantics of SQL ``json_extract(col, '$.field')``.  ``type`` casts
    the result (nulls preserved)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = parse_json_column(col)
    if field not in t.column_names:
        out = pa.nulls(len(col), type or pa.null())
        return out
    arr = t[field]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if type is not None:
        arr = pc.cast(arr, type)
    return arr
