"""Parquet sources with column pruning (reference source analogue S1).

The reference's batch source is a byte-framing loop (``stdf2ph5.py:354-368``);
here framing is Parquet's job and ``ray.data.read_parquet`` fans fragments
out to tasks. Always pass ``columns`` so a 2-column transform doesn't read
the (content-dominated) full table off storage.
"""

from __future__ import annotations

import os

import ray.data as rd


def read_corpus(corpus_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read the corpus table (repo, path, commit, lang, content)."""
    path = os.path.join(corpus_dir, "corpus")
    if not os.path.isdir(path):
        path = corpus_dir
    return rd.read_parquet(path, columns=columns)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> rd.Dataset:
    """Read one of the driver's test tables (TESTDATA.md) with pruning."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns, **kwargs)
