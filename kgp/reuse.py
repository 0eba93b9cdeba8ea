"""Multi-consumer reuse points — local checkpoint vs lineage stage tables.

A "reuse point" is a stage output consumed by more than one downstream
subtree (the tagged corpus feeds the relation/coref/linking branches;
each cf_embedding layer feeds messages + base + the final concat). It
must be materialized exactly once, and the downstream plans must read
the materialized form (plan truncation keeps Catalyst analysis time flat
as the pipeline deepens).

Two interchangeable implementations, both ``(df, name) -> DataFrame``:

- :func:`local_reuse` — eager ``localCheckpoint``. Fastest on a single
  box, but blocks live in executor/driver block storage: NOT
  fault-tolerant on executor loss, and at sf16 the pinned tagged/mention
  tables forced a 16 GB driver heap (SCALING.md "Round-4: sf16 memory
  finding"). The single-JVM default.

- :func:`lineage_reuse` — each reuse point becomes a
  :class:`kgp.lineage.LineageLog` stage TABLE (bucketed parquet + a
  per-partition manifest, the sandbox analogue of Iceberg
  ``overwritePartitions``): executor-loss safe, resumable mid-run (a
  crashed job skips completed reuse points on re-run), and the blocks
  never touch the block manager — the cluster profile, and the same
  mechanism :func:`kgp.ops.dedup.run_dedup_resumable` already uses.

``KGP_REUSE=table`` flips the default from local to lineage-table
(``KGP_REUSE_DIR`` pins the table root; otherwise a fresh temp dir per
pipeline run, so repeated bench legs re-execute rather than resume).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def input_fingerprint(transcripts: DataFrame, cfg) -> str:
    """Partitioning-independent content hash of the input + config
    (drives stage-skip on resume: any input or config change invalidates
    every downstream stage table)."""
    h = transcripts.select(
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "text")).alias("h"),
        F.count("*").alias("n"),
    ).first()
    cfg_h = hashlib.md5(repr(cfg).encode()).hexdigest()[:12]
    return f"{h['h']}:{h['n']}:{cfg_h}"


def local_reuse(df: DataFrame, name: str | None = None) -> DataFrame:
    """Eager localCheckpoint (single-JVM default). KGP_CKPT_SER=1 stores
    the blocks serialized (compact UnsafeRow bytes — less block-manager
    residency, one extra copy per consumer read)."""
    if os.environ.get("KGP_CKPT_SER") == "1":
        from pyspark import StorageLevel

        return df.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint()


def input_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the files feeding ``df`` — metadata only
    (no job). 0 when the input isn't file-backed (synthetic ranges,
    streaming sources)."""
    total = 0
    try:
        for p in df.inputFiles():
            if p.startswith("file:"):
                p = p[len("file:") :]
                while p.startswith("//"):
                    p = p[1:]
            total += os.path.getsize(p)
    except Exception:
        return 0
    return total


def local_reuse_for(in_bytes: int = 0):
    """Scale-adaptive local profile: pick the checkpoint storage level
    from the job's input size.

    Deserialized row blocks (localCheckpoint's default) are fastest when
    the pinned tables fit comfortably — but they carry ~10-20x the
    on-disk parquet footprint as JVM objects, and at sf16 that residency
    both forced a 16 GB driver heap and taxed memory bandwidth: the
    round-5 eventlog decomposition measured +14% task core-seconds on
    the 4-core leg, and switching the pins to serialized UnsafeRow bytes
    cut that leg ~23% (same host, same input). At sf0.1 the same switch
    is a ~7% LOSS (the extra ser/deser copy on a job whose pins are a
    few MB). So: serialized above KGP_CKPT_SER_MB (default 32 MB of
    input parquet — sf4/sf16 qualify, the sf0.1 driver bench does not),
    deserialized below; KGP_CKPT_SER=0/1 force-overrides either way.

    Above KGP_CKPT_DISK_MB (default 96 MB of input parquet — sf16
    qualifies, sf4 does not) the pins go DISK_ONLY: the round-5 jstack
    probe of the sf16 4-core leg caught the 70 s driver-only gap
    red-handed as SINGLE-THREADED block eviction — the broadcast-exchange
    thread calling MemoryStore.evictBlocksToFreeSpace -> DiskStore.putBytes
    to push pinned checkpoint blocks to disk one at a time while every
    core idled. DISK_ONLY pays the same disk write, but inside the
    checkpoint job's parallel tasks (and the OS page cache serves the
    re-reads), so the serial stall never forms.
    """
    level = os.environ.get("KGP_CKPT_LEVEL")
    if not level:
        env = os.environ.get("KGP_CKPT_SER")
        if env == "1":
            level = "ser"
        elif env == "0":
            level = "deser"
        else:
            disk_mb = float(os.environ.get("KGP_CKPT_DISK_MB", "96"))
            ser_mb = float(os.environ.get("KGP_CKPT_SER_MB", "32"))
            level = (
                "disk" if in_bytes > disk_mb * 1e6
                else "ser" if in_bytes > ser_mb * 1e6
                else "deser"
            )

    if level == "deser":
        return lambda df, name=None: df.localCheckpoint()

    from pyspark import StorageLevel

    sl = StorageLevel.DISK_ONLY if level == "disk" else StorageLevel.MEMORY_AND_DISK

    def reuse(df: DataFrame, name: str | None = None) -> DataFrame:
        return df.localCheckpoint(eager=True, storageLevel=sl)

    reuse.serialized = True  # introspectable in tests
    reuse.level = level
    return reuse


def lineage_reuse(
    spark: SparkSession,
    outdir: str,
    fingerprint: str,
    n_buckets: int = 16,
    bucket_on: str | None = "conv_id",
):
    """``(df, name) -> DataFrame`` that persists each reuse point as a
    LineageLog stage table under ``outdir`` and reads it back.

    Stages whose schema carries ``bucket_on`` commit at bucket
    granularity (dynamic partition overwrite, per-bucket progress — a
    mid-stage crash rebuilds only dirty buckets); others use the
    whole-stage tmp-dir + rename commit. Thread-safe across the
    pipeline's concurrent branch threads: each reuse point is its own
    stage with its own manifest file.
    """
    from kgp.lineage import LineageLog

    log = LineageLog(outdir, n_buckets=n_buckets)

    def reuse(df: DataFrame, name: str | None = None) -> DataFrame:
        if name is None:
            raise ValueError("lineage_reuse requires a stage name per reuse point")
        out = log.run_stage(spark, name, fingerprint, lambda: df, bucket_on=bucket_on)
        # the bucketed table layout adds its partition column on read-back;
        # a reuse point must hand downstream consumers the INPUT schema
        if "bucket" in out.columns and "bucket" not in df.columns:
            out = out.drop("bucket")
        return out

    reuse.lineage = log  # callers can read manifests / skew reports
    return reuse


def default_reuse(
    spark: SparkSession,
    fingerprint: str = "adhoc",
    outdir: str | None = None,
    input_df: DataFrame | None = None,
):
    """The env-selected profile: ``KGP_REUSE=table`` -> lineage stage
    tables (cluster profile), anything else -> local checkpoints whose
    storage level adapts to the input scale (:func:`local_reuse_for`)."""
    if os.environ.get("KGP_REUSE") == "table":
        outdir = outdir or os.environ.get("KGP_REUSE_DIR") or tempfile.mkdtemp(
            prefix="kgp-reuse-"
        )
        return lineage_reuse(spark, outdir, fingerprint)
    return local_reuse_for(input_bytes(input_df) if input_df is not None else 0)
