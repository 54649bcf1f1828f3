"""Resumable runs with per-partition lineage and metrics (north-rule M6).

The north rule requires runs "resumable from checkpoint with
per-partition lineage + metrics" WITHOUT a streaming/RocksDB state
store. The reference has no notion of resumability at all (a killed
protosc run restarts from scratch; its only persistence is the
in-memory FeatureMatrix — reference protosc/feature_matrix.py:70), so
this module is pure engine infrastructure.

Design (batch-idempotent, cluster-scale):

- The output is bucketed by a *stable* key hash,
  ``bucket = pmod(xxhash64(conv_id), n_buckets)`` — deterministic
  across runs, cluster sizes, and input partitionings (never
  ``spark_partition_id``).
- Buckets are processed in *waves* (``ceil(n_buckets / buckets_per_wave)``
  Spark jobs). One job per wave — NOT one job per bucket — so the
  cluster stays saturated; wave size trades restart granularity
  against scheduling overhead. Each wave writes
  ``out_dir/bucket=N/`` directories via dynamic partition overwrite,
  so a *failed* wave leaves no committed files (Spark's output
  committer) and a *re-run* of a completed wave rewrites the same
  bytes (idempotent).
- After each wave commits, a per-bucket lineage manifest
  ``_manifest/bucket-N.json`` is written with: input lineage (a
  digest of the source — at production scale the Iceberg
  ``snapshot_id``), row count, wall seconds, engine version, and the
  run config. Resume = list manifests, skip completed buckets.
- ``metrics.json`` aggregates per-bucket metrics at the end.

Recovery contract: kill the driver at any point; re-invoking
``run_resumable`` with the same arguments completes only the missing
buckets and produces byte-identical output (tests/test_checkpoint.py
kills between waves and diffs against a single-shot run).
"""

from __future__ import annotations

import json
import math
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENGINE_VERSION = "protosc_spark-0.1"
BUCKET_COL = "__bucket"


def with_bucket(df: DataFrame, n_buckets: int, key: str = "conv_id") -> DataFrame:
    """Stable output bucket: pmod(xxhash64(key), n_buckets)."""
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"bucket-{bucket:05d}.json")


def completed_buckets(out_dir: str) -> set[int]:
    """Buckets with a committed lineage manifest."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("bucket-") and name.endswith(".json"):
            out.add(int(name[len("bucket-"):-len(".json")]))
    return out


def read_manifests(out_dir: str) -> list[dict]:
    entries = []
    for b in sorted(completed_buckets(out_dir)):
        with open(_manifest_path(out_dir, b)) as fh:
            entries.append(json.load(fh))
    return entries


def _write_manifest(out_dir: str, entry: dict) -> None:
    """Atomic single-file commit: write temp, rename."""
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = _manifest_path(out_dir, entry["bucket"])
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(entry, fh, sort_keys=True)
    os.replace(tmp, path)


def input_lineage(df: DataFrame) -> dict:
    """Lineage descriptor of the input.

    On a parquet/Iceberg-backed input the file listing (or Iceberg
    snapshot_id) identifies the exact data version; for derived /
    in-memory frames we fall back to the logical-plan text digest —
    deterministic for our seeded datagen.
    """
    files = df.inputFiles()
    if files:
        basis = "\n".join(sorted(files))
        kind = "files"
    else:
        # Catalyst's canonicalized plan normalizes per-construction
        # expression ids / lambda-variable counters STRUCTURALLY
        # (AttributeReference -> positional `none#N`), so two builds of
        # the SAME pipeline digest identically while literals that merely
        # contain '#<digits>' (text == 'item#42') or columns named x_2
        # stay distinguishable — a raw-regex strip over the plan string
        # conflated those and could silently accept stale buckets.
        basis = df._jdf.queryExecution().analyzed().canonicalized().toString()
        kind = "plan"
    import hashlib

    return {"kind": kind, "digest": hashlib.sha256(basis.encode()).hexdigest()[:16]}


def run_resumable(
    build: Callable[[SparkSession], DataFrame],
    out_dir: str,
    n_buckets: int = 64,
    buckets_per_wave: int = 16,
    key: str = "conv_id",
    spark: SparkSession | None = None,
    fail_after_wave: int | None = None,
    on_lineage_mismatch: str = "fail",
) -> dict:
    """Execute ``build(spark)`` bucket-wise with resume-on-restart.

    A completed bucket is only SKIPPED if its manifest matches the
    current invocation (same input lineage digest, n_buckets, key and
    engine version) — resuming over changed input data or changed
    bucketing must not silently mix stale and fresh buckets.
    ``on_lineage_mismatch``: "fail" (default) raises with the first
    mismatching bucket; "recompute" treats mismatching buckets as not
    done and overwrites them.

    ``fail_after_wave`` is a test hook simulating a driver kill after
    N committed waves. Returns the aggregated metrics dict (also
    written to ``out_dir/metrics.json`` on completion).
    """
    if on_lineage_mismatch not in ("fail", "recompute"):
        raise ValueError("on_lineage_mismatch must be 'fail' or 'recompute'")
    spark = spark or SparkSession.getActiveSession()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    df = build(spark)
    lineage = input_lineage(df)
    df = with_bucket(df, n_buckets, key=key)

    done = set()
    for b in sorted(completed_buckets(out_dir)):
        with open(_manifest_path(out_dir, b)) as fh:
            m = json.load(fh)
        consistent = (
            m.get("input") == lineage
            and m.get("n_buckets") == n_buckets
            and m.get("key") == key
            and m.get("engine") == ENGINE_VERSION
        )
        if consistent:
            done.add(b)
        elif on_lineage_mismatch == "fail":
            raise RuntimeError(
                f"bucket {b} manifest does not match this invocation "
                f"(manifest input={m.get('input')}, n_buckets="
                f"{m.get('n_buckets')}, key={m.get('key')!r}; current "
                f"input={lineage}, n_buckets={n_buckets}, key={key!r}); "
                "pass on_lineage_mismatch='recompute' to overwrite stale "
                "buckets, or use a fresh out_dir"
            )
        else:
            # drop the stale manifest AND its data dir now: dynamic
            # partition overwrite only rewrites partitions the new
            # input actually produces, so an empty new bucket would
            # otherwise leave stale rows behind
            import shutil

            os.remove(_manifest_path(out_dir, b))
            stale_dir = os.path.join(out_dir, f"{BUCKET_COL}={m.get('bucket', b)}")
            if os.path.isdir(stale_dir):
                shutil.rmtree(stale_dir)
    todo = [b for b in range(n_buckets) if b not in done]
    waves = [
        todo[i : i + buckets_per_wave]
        for i in range(0, len(todo), buckets_per_wave)
    ]

    for wave_idx, wave in enumerate(waves):
        t0 = time.time()
        wave_df = df.where(F.col(BUCKET_COL).isin(wave))
        # count per bucket in the same job via an accumulated agg first
        # would double-compute; instead write, then count from committed
        # files (metadata-only on parquet).
        (
            wave_df.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        wall = time.time() - t0
        counts = {
            row[BUCKET_COL]: row["n"]
            for row in spark.read.parquet(out_dir)
            .where(F.col(BUCKET_COL).isin(wave))
            .groupBy(BUCKET_COL)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for b in wave:
            _write_manifest(
                out_dir,
                {
                    "bucket": b,
                    "rows": int(counts.get(b, 0)),
                    "wall_s_wave": round(wall, 3),
                    "wave": wave_idx,
                    "input": lineage,
                    "engine": ENGINE_VERSION,
                    "n_buckets": n_buckets,
                    "key": key,
                    "committed_at": time.time(),
                },
            )
        if fail_after_wave is not None and wave_idx + 1 >= fail_after_wave:
            raise RuntimeError(f"simulated driver kill after wave {wave_idx}")

    entries = read_manifests(out_dir)
    metrics = {
        "engine": ENGINE_VERSION,
        "n_buckets": n_buckets,
        "rows_total": sum(e["rows"] for e in entries),
        "buckets_completed": len(entries),
        "input": lineage,
        "resumed": bool(done),
        "buckets_resumed_over": len(done),
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, sort_keys=True)
    return metrics


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read a completed resumable run's output (bucket column dropped)."""
    return spark.read.parquet(out_dir).drop(BUCKET_COL)
