"""Iceberg-*layout* table store over plain parquet (SURVEY.md §7: no
Iceberg runtime jar assumed — partitioned parquet + snapshot dirs +
atomic tmp-dir renames behind a thin catalog so a real Iceberg catalog
is a config swap).

Write protocol: each append writes to ``<root>/.tmp/<uuid>`` then
``os.rename``s to ``<root>/<table>/snap-<n>-<uuid>`` — rename is atomic
on one filesystem, so readers never observe a partial snapshot (the
analogue of Iceberg's snapshot commit). A snapshot only becomes
visible when Spark's own job-level commit (_SUCCESS) has completed.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, ".tmp"), exist_ok=True)

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def snapshots(self, table: str) -> list[str]:
        d = self._table_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, s) for s in os.listdir(d) if s.startswith("snap-")
        )

    def append(self, df: DataFrame, table: str) -> str:
        """Write df as a new immutable snapshot; returns its path."""
        tmp = os.path.join(self.root, ".tmp", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(tmp)
        os.makedirs(self._table_dir(table), exist_ok=True)
        n = len(self.snapshots(table))
        dest = os.path.join(self._table_dir(table), f"snap-{n:06d}-{uuid.uuid4().hex[:8]}")
        os.rename(tmp, dest)
        return dest

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        snaps = self.snapshots(table)
        if not snaps:
            return None
        return spark.read.parquet(*snaps)

    def exists(self, table: str) -> bool:
        return bool(self.snapshots(table))
