"""Regenerate the registry-derived coverage counts in README.md and
SURVEY.md (round-3 verdict #8: hand-written counts drifted — '60' vs a
61-query registry). Run after adding gate queries:

    python tools/update_counts.py

tests/test_counts.py asserts the documents match ``len(queries())``,
so a drifted count fails the suite instead of shipping.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def registry_counts() -> tuple[int, int]:
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return len(q), len(set(q) & set(o))


PATTERNS = {
    "README.md": [
        (r"the \d+ driver queries", "the {n} driver queries"),
    ],
    "SURVEY.md": [
        (
            r"driver correctness gate \*\*\d+ queries",
            "driver correctness gate **{n} queries",
        ),
    ],
}


def main() -> None:
    n, _with_oracle = registry_counts()
    for fname, pats in PATTERNS.items():
        path = os.path.join(REPO, fname)
        text = open(path).read()
        for pat, repl in pats:
            text, cnt = re.subn(pat, repl.format(n=n), text)
            if cnt == 0:
                raise SystemExit(f"pattern {pat!r} not found in {fname}")
        open(path, "w").write(text)
        print(f"{fname}: counts set to {n}")


if __name__ == "__main__":
    main()
