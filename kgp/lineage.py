"""Per-partition lineage + checkpointed resumability (SURVEY.md §4.3(3)).

The production design is an Iceberg ``_lineage`` table plus idempotent
``overwritePartitions`` per stage; with no Iceberg jar in this sandbox the
same contract is implemented over a directory layout:

    <root>/<stage>/data/...            partitioned parquet (the stage table)
    <root>/_lineage/<stage>.json       manifest: per-partition rows/bytes,
                                       wall time, input fingerprint, status

A stage runs as ``run_stage(name, build_fn)``:

- if the manifest records status=ok for the same input fingerprint, the
  stage is **skipped** and its output is read back (resume path);
- otherwise the stage builds, writes atomically (tmp dir + rename), records
  per-partition metrics, and commits the manifest last — a crash between
  write and commit re-runs the stage idempotently (same content hash ids,
  same output).

Per-partition metrics come from a groupBy over the same bucket key the
table is partitioned on — they double as the skew report the north_rule
asks for.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


class LineageLog:
    def __init__(self, root: str, n_buckets: int = 16):
        self.root = root
        self.n_buckets = n_buckets
        self.dir = os.path.join(root, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.json")

    def read_manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_done(self, stage: str, input_fingerprint: str) -> bool:
        m = self.read_manifest(stage)
        return bool(m and m.get("status") == "ok" and m.get("input") == input_fingerprint)

    def data_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "data")

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        input_fingerprint: str,
        build_fn,
        bucket_on: str | None = "conv_id",
    ) -> DataFrame:
        """Build-or-resume one stage; returns the stage DataFrame (read back
        from its table so downstream consumers always see the persisted,
        partition-pruned form)."""
        out = self.data_path(stage)
        if self.is_done(stage, input_fingerprint):
            return spark.read.parquet(out)
        t0 = time.time()
        df = build_fn()
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        writer = df
        part_metrics = []
        if bucket_on is not None and bucket_on in df.columns:
            writer = df.withColumn("bucket", F.pmod(F.xxhash64(F.col(bucket_on)), F.lit(self.n_buckets)).cast("int"))
            writer.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
            back = spark.read.parquet(tmp)
            part_metrics = [
                {"partition": int(r["bucket"]), "rows_out": int(r["n"])}
                for r in back.groupBy("bucket").agg(F.count("*").alias("n")).collect()
            ]
            rows = sum(p["rows_out"] for p in part_metrics)
        else:
            writer.write.mode("overwrite").parquet(tmp)
            rows = spark.read.parquet(tmp).count()
        os.rename(tmp, out)
        manifest = {
            "stage": stage,
            "status": "ok",
            "input": input_fingerprint,
            "rows_out": rows,
            "wall_ms": int((time.time() - t0) * 1000),
            "partitions": sorted(part_metrics, key=lambda p: p["partition"]),
            "committed_at": time.time(),
        }
        with open(self._manifest_path(stage) + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(self._manifest_path(stage) + ".tmp", self._manifest_path(stage))
        return spark.read.parquet(out)

    def skew_report(self, stage: str) -> dict:
        """max/median partition rows — the salting-effectiveness metric."""
        m = self.read_manifest(stage) or {}
        rows = sorted(p["rows_out"] for p in m.get("partitions", []))
        if not rows:
            return {"max": 0, "median": 0, "ratio": 0.0}
        med = rows[len(rows) // 2]
        return {"max": rows[-1], "median": med, "ratio": rows[-1] / max(med, 1)}
