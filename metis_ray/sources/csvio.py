"""Lossless CSV source/sink — the SURVEY §2.1 S8/S9 rows made concrete.

The reference spills overflow batches to CSV and reloads them through
pandas (`Metis/tools/stdf2ph5.py` S8/S9); Ray's object-store spilling
replaces the *spill* role, but the interchange role (CSV in, CSV out,
nothing lost) is real and is implemented here: `write_table_csv` streams
a Dataset to one CSV file per block and `read_table_csv` reads it back
with an EXPLICIT Arrow schema (no string-column inference — SURVEY §2.2
M7's inference risk is opted out of by contract). pyarrow's CSV writer
emits shortest-roundtrip doubles and ISO-8601 microsecond timestamps, so
the round trip is bit-exact for every test-table type — proven by
`tests/test_csvio.py` (exact column equality vs the parquet original,
floats and `props` JSON strings included) and by the
`events_hourly_csv` driver query, whose DuckDB twin runs over the
PARQUET view: a hash match certifies the CSV path lost nothing.

Scale shape: both directions stream block-by-block (one CSV file per
block on write, per-file read tasks with column projection after read);
CSV costs ~3-5x parquet in bytes and parse time — it is the interchange
path, not the storage path.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv

import ray.data as rd


def write_table_csv(ds: rd.Dataset, out_dir: str) -> None:
    """Stream ``ds`` to ``out_dir`` as one CSV file per block."""
    ds.write_csv(out_dir)


def read_table_csv(path: str, schema: pa.Schema,
                   columns: list[str] | None = None) -> rd.Dataset:
    """Read a CSV file/dir back with explicit types (no inference).
    ``columns`` prunes AFTER parse — CSV is row-major, so unlike parquet
    the full line is always decoded; pruning only trims the shuffle."""
    convert = pa.csv.ConvertOptions(
        column_types={f.name: f.type for f in schema})
    ds = rd.read_csv(path, convert_options=convert)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def csv_roundtrip_table(sf_dir: str, name: str, schema: pa.Schema,
                        root: str = "/tmp/metis_ray_csv") -> rd.Dataset:
    """The cached parquet->CSV->Dataset round trip of one test table
    (keyed by source mtime, so a regenerated table re-lands)."""
    from metis_ray.sources.parquet import read_table

    src = os.path.join(sf_dir, f"{name}.parquet")
    key = f"{os.path.basename(os.path.normpath(sf_dir))}_{name}_" \
          f"{int(os.path.getmtime(src))}"
    out = os.path.join(root, key)
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil
        if os.path.exists(out):
            shutil.rmtree(out)
        os.makedirs(out, exist_ok=True)
        write_table_csv(read_table(sf_dir, name), out)
        with open(marker, "w") as fh:
            fh.write("ok")
    files = [os.path.join(out, f) for f in sorted(os.listdir(out))
             if f.endswith(".csv")]
    return read_table_csv(files, schema)
