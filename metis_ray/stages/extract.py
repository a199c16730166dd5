"""Typed, language-dispatched edge extraction — the core transform.

This is Metis-Ray's analogue of the reference's 25-way type-dispatch record
parser (``Metis/tools/STDFHelper.py:248-347`` routes each ``(REC_TYP,
REC_SUB)`` to a typed parser): each batch row is dispatched by its ``lang``
column to one of six compiled import/include scanners, emitting 0..k edge
candidate rows per file (flat-map shape).  Rows the scanner cannot interpret
are tolerated and surface later as unresolved-import counts, mirroring
unknown-record tolerance (``stdf2csv.py:178-182``).

Run as an ACTOR POOL stage: regexes are compiled once per actor in
``__init__`` and reused per batch::

    edges_raw = corpus.map_batches(EdgeExtractor, batch_format="pyarrow",
                                   zero_copy_batch=True, concurrency=N)

The ``content`` column is dropped here (projection as early as possible —
content dominates block size; SURVEY.md section 7.4).

Canonical module key: dotted path ``org0.repo3.pkg1.mod9``. Each language
renders imports differently (``import a.b`` / ``#include "a/b.h"`` /
``require('a/b')`` / ``import a.b.C;`` / ``import "a/b"`` / ``use a::b;``);
the scanners normalize every form back to the dotted key so resolution is a
single dictionary probe regardless of source language.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from metis_ray.functions.hashing import hash64

_SRC_PREFIXES = ("src/", "lib/", "include/")
_STRIP_EXT = re.compile(r"\.(h|hpp|hh|py|c|cc|cpp|js|mjs|ts|java|go|rs)$")


def module_key_for_path(repo: str, path: str) -> str:
    """The engine-side file->module naming convention used to build the
    symbol table (resolve.py). Pure function of (repo, path)."""
    p = path
    for pre in _SRC_PREFIXES:
        if p.startswith(pre):
            p = p[len(pre):]
            break
    p = _STRIP_EXT.sub("", p)
    return repo.replace("/", ".") + "." + p.replace("/", ".")


def _dot(slashed: str) -> str:
    s = slashed
    if s.startswith("./"):
        s = s[2:]
    s = _STRIP_EXT.sub("", s)
    return s.strip("/").replace("/", ".")


class EdgeExtractor:
    """Callable-class stage for ``map_batches``: per-lang import scanning.

    Output columns: ``src`` (int64 vertex id = hash64("repo/path")),
    ``src_repo``, ``src_path``, ``lang``, ``module`` (dotted candidate).
    """

    def __init__(self) -> None:
        # one compiled scanner per language, built ONCE per actor
        self._scan = {
            "python": self._python,
            "c": self._c,
            "javascript": self._javascript,
            "java": self._java,
            "go": self._go,
            "rust": self._rust,
        }
        self._py_import = re.compile(r"^\s*import\s+([\w.]+(?:\s*,\s*[\w.]+)*)", re.M)
        self._py_from = re.compile(r"^\s*from\s+([\w.]+)\s+import\s+([\w*]+(?:\s*,\s*[\w*]+)*)", re.M)
        self._c_include = re.compile(r'^\s*#\s*include\s*[<"]([^>"]+)[>"]', re.M)
        self._js_import = re.compile(r"""import\s+(?:[\w${},*\s]+\s+from\s+)?['"]([^'"]+)['"]""")
        self._js_require = re.compile(r"""require\(\s*['"]([^'"]+)['"]\s*\)""")
        self._java_import = re.compile(r"^\s*import\s+(?:static\s+)?([\w.]+)\s*;", re.M)
        self._go_single = re.compile(r'^\s*import\s+(?:\w+\s+)?"([^"]+)"', re.M)
        self._go_block = re.compile(r"^\s*import\s*\(([^)]*)\)", re.M | re.S)
        self._go_block_line = re.compile(r'"([^"]+)"')
        self._rust_use = re.compile(r"^\s*(?:pub\s+)?use\s+([\w:]+)", re.M)

    # ---- per-language scanners: content -> list of dotted module keys ----

    def _python(self, text: str) -> list[str]:
        mods: list[str] = []
        for grp in self._py_import.findall(text):
            mods.extend(m.strip() for m in grp.split(","))
        for head, names in self._py_from.findall(text):
            for name in names.split(","):
                name = name.strip()
                mods.append(head if name == "*" else f"{head}.{name}")
        return mods

    def _c(self, text: str) -> list[str]:
        return [_dot(m) for m in self._c_include.findall(text)]

    def _javascript(self, text: str) -> list[str]:
        return ([_dot(m) for m in self._js_import.findall(text)]
                + [_dot(m) for m in self._js_require.findall(text)])

    def _java(self, text: str) -> list[str]:
        out = []
        for m in self._java_import.findall(text):
            out.append(m[:-2] if m.endswith(".*") else m)
        return out

    def _go(self, text: str) -> list[str]:
        mods = [_dot(m) for m in self._go_single.findall(text)]
        for block in self._go_block.findall(text):
            mods.extend(_dot(m) for m in self._go_block_line.findall(block))
        return mods

    def _rust(self, text: str) -> list[str]:
        out = []
        for m in self._rust_use.findall(text):
            parts = [p for p in m.split("::") if p]
            while parts and parts[0] in ("crate", "self", "super"):
                parts.pop(0)
            if parts:
                out.append(".".join(parts))
        return out

    # ---- batch entry point ----------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        langs = batch["lang"].to_pylist()
        contents = batch["content"].to_pylist()
        quarantined = (batch["quarantined"].to_pylist()
                       if "quarantined" in batch.column_names
                       else [False] * batch.num_rows)

        o_repo: list[str] = []
        o_path: list[str] = []
        o_lang: list[str] = []
        o_mod: list[str] = []
        src_key: list[str] = []
        for repo, path, lang, content, q in zip(repos, paths, langs, contents, quarantined):
            if q or content is None:
                continue
            scan = self._scan.get(lang)
            if scan is None:
                continue
            key = f"{repo}/{path}"
            for mod in scan(content):
                o_repo.append(repo)
                o_path.append(path)
                o_lang.append(lang)
                o_mod.append(mod)
                src_key.append(key)

        src = hash64(src_key) if src_key else np.empty(0, np.int64)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "src_repo": pa.array(o_repo, pa.string()),
            "src_path": pa.array(o_path, pa.string()),
            "lang": pa.array(o_lang, pa.string()),
            "module": pa.array(o_mod, pa.string()),
        })
