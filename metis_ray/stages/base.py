"""Stage protocol: anything acceptable to ``Dataset.map_batches``.

The reference exposes a deliberately pass-through mid-pipeline hook where
users insert custom record transforms (``Metis/python/metis_process.py:17-21``,
no-op ``do_transform_ip`` at ``:50-51``).  Metis-Ray's equivalent extension
surface is simply "any callable / callable class you can hand to
``map_batches``"; ``PassThrough`` is the identity default.
"""

from __future__ import annotations

import pyarrow as pa


class PassThrough:
    """Identity stage (the ``metis_process`` analogue). Zero-copy."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch
