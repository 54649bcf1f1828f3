"""Regenerate the frozen VALUES oracles in __spark_entry__.oracle_sql().

The filter_select / genetic_select / mm_visual_features queries are
fully deterministic (fixed seeds, deterministic solvers, sha2-chained
payloads), so their expected rows are frozen as literal
``SELECT * FROM (VALUES ...)`` DuckDB oracles — giving the driver gate
a real hash check instead of a rows-only pass. If an intentional
algorithm change shifts their output, run this script and paste the
printed SQL over the corresponding oracle_sql() entries.

Usage:  python tools/freeze_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FROZEN = ["filter_select", "genetic_select", "mm_visual_features"]


def values_sql(rows, colnames, types) -> str:
    def lit(v, t):
        if t == "str":
            return f"'{v}'"
        if t == "bool":
            return "true" if v else "false"
        if t == "int":
            return f"{int(v)}::INT"
        if t == "double":
            return f"{v!r}::DOUBLE"
        raise ValueError(t)

    vals = ",\n                ".join(
        "(" + ", ".join(lit(v, t) for v, t in zip(r, types)) + ")" for r in rows
    )
    cols = ", ".join(colnames)
    return (
        "\n            SELECT * FROM (VALUES\n                "
        + vals
        + f"\n            ) t({cols})\n            ORDER BY {colnames[0]}\n        "
    )


TYPES = {
    "filter_select": ("int", "bool"),
    "genetic_select": ("int", "bool"),
    "mm_visual_features": ("str", "int", "double"),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod
    from protosc_spark.session import get_spark

    spark = get_spark()
    qs = entry_mod.queries()
    for name in FROZEN:
        df = qs[name](spark, sf_dir)
        rows = [tuple(r) for r in df.collect()]
        print(f'        "{name}": """{values_sql(rows, df.columns, TYPES[name])}""",')


if __name__ == "__main__":
    main()
