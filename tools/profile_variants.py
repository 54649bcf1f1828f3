"""Config-variant scaling profile for the flagship job.

Tests whether driver-side fixed costs (AQE replanning between stages,
small Arrow batches, too-few shuffle partitions) are the non-scaling
fraction, by timing the same job under config variants at two core
counts in separate JVMs.

Usage: python tools/profile_variants.py [n_conv] [variant ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "base": {},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "noaqe_bigbatch": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    },
    "noaqe_bigbatch_2x": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        "__shuffle_mult": "2",
    },
}

CHILD = r"""
import json, sys, time
sys.path.insert(0, "@@REPO@@")
from protosc_spark.session import get_spark
from protosc_spark.datagen import generate_transcripts, generate_attribute_updates
from protosc_spark.pipeline import flagship_features

cores = int(sys.argv[1]); n_conv = int(sys.argv[2])
conf = json.loads(sys.argv[3])
mult = int(conf.pop("__shuffle_mult", "1"))
spark = get_spark("profile_variants", master="local[%d]" % cores,
                  shuffle_partitions=max(cores * mult, 8), extra_conf=conf)
tr = generate_transcripts(spark, n_conversations=n_conv, seed=42).cache()
n_turns = tr.count()
up = generate_attribute_updates(spark, n_conversations=n_conv, seed=42)

def run():
    out, _ = flagship_features(tr, up)
    out.write.mode("overwrite").format("noop").save()

run()  # warmup
wall = float("inf")
for _ in range(2):
    t0 = time.time()
    run()
    wall = min(wall, time.time() - t0)
print(json.dumps({"cores": cores, "turns": n_turns, "wall": round(wall, 2),
                  "tps": round(n_turns / wall, 1)}))
spark.stop()
"""


def run(cores: int, n_conv: int, conf: dict) -> dict:
    script = CHILD.replace("@@REPO@@", REPO)
    p = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_conv), json.dumps(conf)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    names = sys.argv[2:] or list(VARIANTS)
    for name in names:
        conf = VARIANTS[name]
        lo = run(4, n_conv, dict(conf))
        hi = run(16, n_conv, dict(conf))
        eff = (hi["tps"] / lo["tps"]) / 4.0
        print(json.dumps({"variant": name, "local4": lo, "local16": hi,
                          "eff_4_16": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
