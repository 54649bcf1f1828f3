"""Resumable-run contract (north rule: "resumable from checkpoint with
per-partition lineage + metrics").

Kill-and-resume: a run killed between waves must, on re-invocation,
complete ONLY the missing buckets and produce exactly the rows a
single-shot run produces. Lineage manifests of already-committed
buckets must survive the resume untouched.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from protosc_spark.checkpoint import (
    completed_buckets,
    read_manifests,
    read_output,
    run_resumable,
)
from protosc_spark.pipeline import flagship_features

N_BUCKETS = 8
WAVE = 2  # buckets per wave -> 4 waves total


def _build(transcripts):
    def build(spark):
        out, _ = flagship_features(transcripts, dedup=False)
        return out

    return build


def _rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, tuple(r.features))
        for r in df.select("conv_id", "turn_idx", "features").collect()
    )


def test_kill_and_resume_matches_single_shot(spark, transcripts, tmp_path):
    single = str(tmp_path / "single")
    resumed = str(tmp_path / "resumed")
    build = _build(transcripts)

    run_resumable(build, single, n_buckets=N_BUCKETS, buckets_per_wave=WAVE)

    with pytest.raises(RuntimeError, match="simulated driver kill"):
        run_resumable(
            build, resumed, n_buckets=N_BUCKETS, buckets_per_wave=WAVE,
            fail_after_wave=2,
        )
    partial = completed_buckets(resumed)
    assert 0 < len(partial) < N_BUCKETS
    stamps_before = {
        e["bucket"]: e["committed_at"] for e in read_manifests(resumed)
    }

    metrics = run_resumable(
        build, resumed, n_buckets=N_BUCKETS, buckets_per_wave=WAVE
    )
    assert metrics["resumed"] is True
    assert metrics["buckets_resumed_over"] == len(partial)
    assert metrics["buckets_completed"] == N_BUCKETS

    # previously committed buckets were NOT recomputed
    stamps_after = {
        e["bucket"]: e["committed_at"] for e in read_manifests(resumed)
    }
    for b, t in stamps_before.items():
        assert stamps_after[b] == t

    assert _rows(read_output(spark, resumed)) == _rows(read_output(spark, single))


def test_manifest_lineage_and_metrics(spark, transcripts, tmp_path):
    out = str(tmp_path / "run")
    metrics = run_resumable(
        _build(transcripts), out, n_buckets=4, buckets_per_wave=4
    )
    entries = read_manifests(out)
    assert len(entries) == 4
    n_expected = transcripts.count()
    assert sum(e["rows"] for e in entries) == n_expected == metrics["rows_total"]
    digests = {e["input"]["digest"] for e in entries}
    assert len(digests) == 1  # one input version across all buckets
    for e in entries:
        assert e["engine"].startswith("protosc_spark")
        assert e["n_buckets"] == 4
    with open(os.path.join(out, "metrics.json")) as fh:
        assert json.load(fh)["rows_total"] == n_expected


def test_completed_run_is_noop(spark, transcripts, tmp_path):
    out = str(tmp_path / "noop")
    build = _build(transcripts)
    run_resumable(build, out, n_buckets=4, buckets_per_wave=2)
    stamps = {e["bucket"]: e["committed_at"] for e in read_manifests(out)}
    metrics = run_resumable(build, out, n_buckets=4, buckets_per_wave=2)
    assert metrics["buckets_resumed_over"] == 4
    assert {
        e["bucket"]: e["committed_at"] for e in read_manifests(out)
    } == stamps


def test_resume_rejects_changed_input_lineage(spark, transcripts, tmp_path):
    """Resuming over a manifest written for DIFFERENT input data or
    bucketing must not silently mix stale and fresh buckets (round-1
    ADVICE): default fails loudly, 'recompute' overwrites everything
    and converges to the fresh input's single-shot output."""
    from protosc_spark.datagen import generate_transcripts

    out = str(tmp_path / "lineage")
    build_v1 = _build(transcripts)
    run_resumable(build_v1, out, n_buckets=4, buckets_per_wave=2)

    other = generate_transcripts(spark, n_conversations=40, seed=7).cache()
    build_v2 = _build(other)
    with pytest.raises(RuntimeError, match="does not match this invocation"):
        run_resumable(build_v2, out, n_buckets=4, buckets_per_wave=2)
    # changed bucketing config over same input is also a mismatch
    with pytest.raises(RuntimeError, match="does not match this invocation"):
        run_resumable(build_v1, out, n_buckets=8, buckets_per_wave=2)

    metrics = run_resumable(
        build_v2, out, n_buckets=4, buckets_per_wave=2,
        on_lineage_mismatch="recompute",
    )
    assert metrics["buckets_resumed_over"] == 0  # nothing was trusted
    fresh = str(tmp_path / "fresh")
    run_resumable(build_v2, fresh, n_buckets=4, buckets_per_wave=2)
    assert _rows(read_output(spark, out)) == _rows(read_output(spark, fresh))


def test_bucket_assignment_stable_across_partitioning(spark, transcripts):
    from protosc_spark.checkpoint import BUCKET_COL, with_bucket

    a = with_bucket(transcripts, 16).select("conv_id", BUCKET_COL)
    b = with_bucket(transcripts.repartition(3), 16).select("conv_id", BUCKET_COL)
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    n_distinct = a.select(BUCKET_COL).distinct().count()
    assert n_distinct > 8  # hash actually spreads
