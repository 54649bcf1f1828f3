"""Stage-level scaling profile: decompose the flagship into its JVM
window stage and its Arrow/Python extract stage and time each variant
at several core counts in separate JVMs, so the non-scaling fraction is
attributable to a specific stage rather than guessed.

Usage: python tools/profile_scaling.py [n_conversations] [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "@@REPO@@")
from protosc_spark.session import get_spark
from protosc_spark.datagen import generate_transcripts, generate_attribute_updates
from protosc_spark.pipeline import flagship_features
from protosc_spark.extract import extract
from protosc_spark.features.text import default_text_extractors
from pyspark.sql import functions as F

cores = int(sys.argv[1]); n_conv = int(sys.argv[2])
spark = get_spark("profile_scaling", master="local[%d]" % cores,
                  shuffle_partitions=max(cores, 8))
tr = generate_transcripts(spark, n_conversations=n_conv, seed=42).cache()
n_turns = tr.count()
up = generate_attribute_updates(spark, n_conversations=n_conv, seed=42)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def best3(make):
    noop(make())  # warmup
    wall = float("inf")
    for _ in range(2):
        t0 = time.time()
        noop(make())
        wall = min(wall, time.time() - t0)
    return wall


def windows_only():
    # full flagship minus the Python/Arrow extract: stop at the window +
    # as-of context columns (all JVM, whole-stage codegen)
    from protosc_spark.pipeline import WINDOW_FEATURES
    out, _ = flagship_features(tr, up, extractors=[])
    return out


def extract_only():
    out, _ = extract(tr, list(default_text_extractors()),
                     keep_cols=["conv_id", "turn_idx"])
    return out


def full():
    out, _ = flagship_features(tr, up)
    return out


res = {"cores": cores, "turns": n_turns}
for name, make in [("windows_only", windows_only),
                   ("extract_only", extract_only),
                   ("full", full)]:
    w = best3(make)
    res[name] = {"wall": round(w, 3), "tps": round(n_turns / w, 1)}
print(json.dumps(res))
spark.stop()
"""


def run(cores: int, n_conv: int) -> dict:
    script = CHILD.replace("@@REPO@@", REPO)
    p = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_conv)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    cores_list = [int(c) for c in sys.argv[2:]] or [4, 16]
    out = {}
    for c in cores_list:
        out[c] = run(c, n_conv)
        print(json.dumps(out[c]), flush=True)
    base = cores_list[0]
    for c in cores_list[1:]:
        for variant in ("windows_only", "extract_only", "full"):
            sp = out[c][variant]["tps"] / out[base][variant]["tps"]
            eff = sp / (c / base)
            print(f"{variant:13s} {base}->{c}: speedup {sp:.2f}  eff {eff:.3f}")


if __name__ == "__main__":
    main()
