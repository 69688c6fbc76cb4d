"""Round-4 A/B: does an overlapped pyarrow DATASET-SCANNER read (background
I/O threads prefetching fragments while the task decodes/sorts) beat the
sequential read_table loop inside the one-core reduce task? Three variants
over the exact production task shape (64 lz4 fragments -> concat -> sort
-> zstd write), at 4 vs 16 concurrent workers:

- loop     : current production path (sequential pq.read_table per fragment)
- scan-io1 : pyarrow.dataset scanner, io_thread_count=1 (honest one-core)
- scan-io4 : scanner with 4 I/O threads (upper bound; OVERSUBSCRIBES the
             one-core Spark task contract — only to bound the possible win)
"""
import multiprocessing as mp, os, shutil, time
import numpy as np

BASE = "/dev/shm/reduce_probe_sc"

def setup(combo):
    import pyarrow as pa, pyarrow.parquet as pq
    pa.set_cpu_count(1)
    rng = np.random.default_rng(combo)
    d = f"{BASE}/c{combo}"
    os.makedirs(d, exist_ok=True)
    n_frag, rows_per = 64, 117
    for i in range(n_frag):
        blob = rng.integers(0, 256, size=(rows_per, 8192), dtype=np.uint8)
        t = pa.table({
            "zkey": pa.array(rng.integers(0, 2**62, rows_per), pa.int64()),
            "image_id": pa.array([f"img_{combo}_{i}_{j}" for j in range(rows_per)]),
            "bytes": pa.array([blob[j].tobytes() for j in range(rows_per)], pa.binary()),
            "w": pa.array(rng.integers(16, 128, rows_per), pa.int32()),
        })
        pq.write_table(t, f"{d}/t{i}.parquet", compression="lz4")
    return combo

def _finish(tbl, d):
    import pyarrow.parquet as pq
    tr = time.time()
    tbl = tbl.sort_by([("zkey", "ascending")])
    ts = time.time()
    pq.write_table(tbl, f"{d}/out.parquet", compression="zstd")
    tw = time.time()
    os.remove(f"{d}/out.parquet")
    return tr, ts, tw

def task_loop(combo):
    import pyarrow as pa, pyarrow.parquet as pq
    pa.set_cpu_count(1)
    d = f"{BASE}/c{combo}"
    t0 = time.time()
    parts = [pq.read_table(f"{d}/{f}") for f in sorted(os.listdir(d)) if f.startswith("t")]
    tbl = pa.concat_tables(parts)
    tr, ts, tw = _finish(tbl, d)
    return (tr - t0, ts - tr, tw - ts)

def _task_scan(combo, io_threads):
    import pyarrow as pa
    import pyarrow.dataset as ds
    pa.set_cpu_count(1)
    pa.set_io_thread_count(io_threads)
    d = f"{BASE}/c{combo}"
    paths = sorted(f"{d}/{f}" for f in os.listdir(d) if f.startswith("t"))
    t0 = time.time()
    tbl = ds.dataset(paths, format="parquet").to_table()
    tr, ts, tw = _finish(tbl, d)
    return (tr - t0, ts - tr, tw - ts)

def task_scan1(combo):
    return _task_scan(combo, 1)

def task_scan4(combo):
    return _task_scan(combo, 4)

if __name__ == "__main__":
    shutil.rmtree(BASE, ignore_errors=True)
    N_COMBO = 32
    with mp.Pool(16) as p:
        p.map(setup, range(N_COMBO))
    results = {}
    for name, fn in (("loop", task_loop), ("scan-io1", task_scan1), ("scan-io4", task_scan4)):
        walls = {}
        for nproc in (4, 16):
            with mp.Pool(nproc) as p:
                p.map(fn, range(min(nproc, 4)))  # warm
                t0 = time.time()
                res = p.map(fn, range(N_COMBO))
                walls[nproc] = time.time() - t0
            r = np.array(res)
            print(f"{name} nproc={nproc}: wall {walls[nproc]:.2f}s | task-sec read {r[:,0].sum():.2f} sort {r[:,1].sum():.2f} write {r[:,2].sum():.2f}", flush=True)
        eff = walls[4] / walls[16] / 4.0
        results[name] = (walls[4], walls[16], eff)
        print(f"{name}: 4->16 scaling efficiency {eff:.3f}", flush=True)
    shutil.rmtree(BASE, ignore_errors=True)
    base_eff = results["loop"][2]
    for name, (w4, w16, eff) in results.items():
        print(f"SUMMARY {name}: wall4 {w4:.2f} wall16 {w16:.2f} eff {eff:.3f} d_eff {eff-base_eff:+.3f}")
