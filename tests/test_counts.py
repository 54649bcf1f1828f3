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
