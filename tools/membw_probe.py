"""Engine-independent host-contention probe: K processes each stream
over a private 512MB float64 array; per-process bandwidth at K=4 vs 16
vs 32 measures the memory-bandwidth ceiling Spark tasks share."""
import multiprocessing as mp, numpy as np, time, json, sys

def worker(q):
    a = np.ones(64_000_000)  # 512 MB
    t0 = time.time()
    s = 0.0
    for _ in range(6):
        s += float(a.sum())
    q.put(6 * a.nbytes / (time.time() - t0) / 1e9)

for k in (1, 2, 4, 8, 16, 32):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(k)]
    [p.start() for p in ps]
    rates = [q.get() for _ in ps]
    [p.join() for p in ps]
    print(json.dumps({"procs": k, "per_proc_GBps": round(np.mean(rates), 2),
                      "agg_GBps": round(sum(rates), 1)}))
