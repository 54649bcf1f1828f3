"""Registry-derived coverage counts in the docs must match the actual
query registry (round-3 verdict #8 — regenerate with
``python tools/update_counts.py``)."""

import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_counts_match_registry():
    n = len(entry.queries())
    readme = open(os.path.join(REPO, "README.md")).read()
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    m = re.search(r"the (\d+) driver queries", readme)
    assert m and int(m.group(1)) == n, "README count drifted — run tools/update_counts.py"
    m = re.search(r"driver correctness gate \*\*(\d+) queries", survey)
    assert m and int(m.group(1)) == n, "SURVEY count drifted — run tools/update_counts.py"


def test_every_query_has_oracle():
    """Full oracle coverage: every registry query hash-checks against
    an oracle (independent SQL or frozen literal), and no oracle is
    orphaned."""
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert not (q - o), f"queries without an oracle: {sorted(q - o)}"
    assert not (o - q), f"oracle entries without a query: {sorted(o - q)}"


def test_bench_records_are_append_only(tmp_path):
    """Round-4 verdict #4: bench runs must never clobber each other —
    each run lands in BENCH/history/ (append-only), last_run.json is a
    copy of the newest."""
    import json

    from bench import write_records

    d = str(tmp_path / "BENCH")
    p1 = write_records({"value": 1}, d)
    p2 = write_records({"value": 2}, d)
    assert p1 != p2
    hist = sorted((tmp_path / "BENCH" / "history").iterdir())
    assert len(hist) == 2
    assert json.load(open(p1))["value"] == 1  # first record untouched
    last = json.load(open(tmp_path / "BENCH" / "last_run.json"))
    assert last["value"] == 2
    assert (tmp_path / "BENCH" / last["history_record"]).exists()
