"""Input validation + per-row sha256 + quarantine flagging.

Reference analogues: format sniffing / version rejection before any parsing
(``Metis/tools/STDFHelper.py:39-139``, aborts at ``stdf2ph5.py:324-326``),
unknown-record tolerance (``stdf2csv.py:178-182``: print + continue, never a
crash), and the streaming sha256 of the preserved raw bytes
(``HDF5Helper.py:14-25``).  Here: rows with an unknown ``lang``, empty
content, or NUL bytes are *flagged* (``quarantined=True``) and counted, not
dropped silently; every row gets ``sha256`` computed from ``content`` — the
per-row lossless-ingestion invariant (BASELINE.json input_hint) that tests
re-verify against an independent driver-side hash.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNOWN_LANGS = frozenset({"python", "c", "javascript", "java", "go", "rust"})


class ValidateAndChecksum:
    """map_batches stage (Arrow in / Arrow out): append ``sha256`` (hex
    string) and ``quarantined`` (bool) columns. Vectorized where Arrow has a
    kernel; sha256 itself is per-row C code (hashlib) — the dominant cost is
    the digest, not the loop."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch["content"]
        sha = hashlib.sha256
        digests = pa.array(
            [sha(s.encode()).hexdigest() if s is not None else None
             for s in content.to_pylist()],
            pa.string(),
        )
        lang_ok = pc.is_in(batch["lang"], value_set=pa.array(sorted(KNOWN_LANGS)))
        nonempty = pc.greater(pc.utf8_length(pc.coalesce(content, pa.scalar(""))), 0)
        # NUL byte => binary garbage masquerading as text
        no_nul = pc.invert(pc.match_substring(pc.coalesce(content, pa.scalar("")), "\x00"))
        ok = pc.and_(pc.and_(lang_ok, nonempty), no_nul)
        quarantined = pc.invert(pc.fill_null(ok, False))
        return batch.append_column("sha256", digests).append_column(
            "quarantined", quarantined)


def quarantine_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial counts (pre-aggregation before the tiny groupby)."""
    q = pc.sum(pc.cast(batch["quarantined"], pa.int64())).as_py() or 0
    return pa.table({
        "rows": pa.array([batch.num_rows], pa.int64()),
        "quarantined": pa.array([q], pa.int64()),
    })
