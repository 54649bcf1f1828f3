"""Per-stage timeline of one flagship pass (REST API of a temporary
UI): stage durations, inter-stage driver gaps, CPU seconds and slot
utilization -- the evidence that the engine has no serial fraction
beyond ~1s of planning per pass.

Usage: python tools/stage_profile.py <cores> <n_conversations>
"""
import sys, time, json, os, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from protosc_spark.session import get_spark
from protosc_spark.datagen import generate_transcripts, generate_attribute_updates
from protosc_spark.pipeline import flagship_features

cores = int(sys.argv[1]); n_conv = int(sys.argv[2])
spark = get_spark("stageprof", master=f"local[{cores}]", shuffle_partitions=max(cores,8),
                  extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"})
sc = spark.sparkContext
tr = generate_transcripts(spark, n_conversations=n_conv, seed=42).cache()
tr.count()
up = generate_attribute_updates(spark, n_conversations=n_conv, seed=42)

def run():
    out, _ = flagship_features(tr, up)
    out.write.mode("overwrite").format("noop").save()

run()  # warmup
import datetime
t0 = time.time()
run()
wall = time.time() - t0
t1 = time.time()

app = json.load(urllib.request.urlopen("http://localhost:4049/api/v1/applications"))[0]["id"]
stages = json.load(urllib.request.urlopen(f"http://localhost:4049/api/v1/applications/{app}/stages?status=complete"))
def ts(s):
    return datetime.datetime.strptime(s[:-3], "%Y-%m-%dT%H:%M:%S.%f").replace(tzinfo=datetime.timezone.utc).timestamp()
rows = []
for s in stages:
    sub = ts(s["submissionTime"]); comp = ts(s["completionTime"])
    if comp < t0 or sub > t1:
        continue
    rows.append((sub-t0, comp-t0, s["stageId"], s["numCompleteTasks"],
                 round(s["executorRunTime"]/1000.0,1), s["name"][:60]))
rows.sort()
print(f"wall={wall:.2f}")
prev = 0.0
for sub, comp, sid, nt, ert, name in rows:
    print(f"s{sid:3d} tasks={nt:3d} start={sub:6.2f} end={comp:6.2f} dur={comp-sub:6.2f} gap={sub-prev:5.2f} cpu={ert:7.1f} {name}")
    prev = max(prev, comp)
spark.stop()
