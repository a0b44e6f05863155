"""Snapshot/table layer: versioned round state with atomic manifests
(B5 checkpoint/resume — new-build; the reference is a stateless binary).

Design (SURVEY.md §7-H4): Iceberg snapshots when the runtime jars are
present; otherwise parquet directories + an atomic ``manifest.json``
per round with identical semantics. Both are keyed by (run_id, round);
a round is visible iff its manifest exists, so a killed run resumes from
the last *complete* round and rewrites any partial round idempotently
(outputs are keyed by (round, url_hash)).

Layout (parquet fallback):

    {state_dir}/{run_id}/round=<k>/<table>.parquet
    {state_dir}/{run_id}/round=<k>/manifest.json   <- atomic rename
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class SnapshotStore:
    def __init__(self, spark: SparkSession, state_dir: str, run_id: str):
        self.spark = spark
        self.root = os.path.join(state_dir, run_id)
        os.makedirs(self.root, exist_ok=True)

    def _round_dir(self, round_no: int) -> str:
        return os.path.join(self.root, f"round={round_no}")

    def write_table(self, round_no: int, name: str, df: DataFrame) -> DataFrame:
        """Write one table of an in-progress round and return it read back
        from disk — downstream consumers then scan columnar parquet instead
        of re-executing the producing plan (critical for the extraction
        UDFs: they run exactly once per round). NOT visible to resume
        until commit()."""
        rdir = self._round_dir(round_no)
        os.makedirs(rdir, exist_ok=True)
        path = os.path.join(rdir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def commit(self, round_no: int, table_names: list[str], stats: dict | None = None) -> None:
        """Atomically publish a round (manifest rename). A crash before
        this leaves a partial round that resume ignores and rewrites."""
        rdir = self._round_dir(round_no)
        written = {n: os.path.join(rdir, f"{n}.parquet") for n in table_names}
        manifest = {"round": round_no, "tables": written, "stats": stats or {}}
        fd, tmp = tempfile.mkstemp(dir=rdir, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(rdir, "manifest.json"))  # atomic commit

    def write_round(self, round_no: int, tables: dict[str, DataFrame], stats: dict | None = None) -> None:
        for name, df in tables.items():
            self.write_table(round_no, name, df)
        self.commit(round_no, list(tables.keys()), stats)

    def read_manifest(self, round_no: int) -> dict | None:
        path = os.path.join(self._round_dir(round_no), "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest_complete_round(self) -> int | None:
        rounds = []
        if not os.path.isdir(self.root):
            return None
        for entry in os.listdir(self.root):
            if entry.startswith("round="):
                k = int(entry.split("=", 1)[1])
                if self.read_manifest(k) is not None:
                    rounds.append(k)
        return max(rounds) if rounds else None

    def read_table(self, round_no: int, name: str) -> DataFrame:
        manifest = self.read_manifest(round_no)
        assert manifest is not None, f"round {round_no} not committed"
        return self.spark.read.parquet(manifest["tables"][name])

    def has_table(self, round_no: int, name: str) -> bool:
        manifest = self.read_manifest(round_no)
        return manifest is not None and name in manifest["tables"]
