"""Replicates the cluster REDUCE task exactly: read 64 lz4 fragments
(image-shaped rows) from /dev/shm, concat, sort_by zkey, write one zstd
parquet — at 4 vs 16 concurrent single-threaded workers."""
import multiprocessing as mp, os, shutil, time
import numpy as np

BASE = "/dev/shm/reduce_probe"

def setup(combo):
    import pyarrow as pa, pyarrow.parquet as pq
    pa.set_cpu_count(1)
    rng = np.random.default_rng(combo)
    d = f"{BASE}/c{combo}"
    os.makedirs(d, exist_ok=True)
    n_frag, rows_per = 64, 117  # mirrors 64 map tasks x ~117 rows
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

def reduce_task(combo):
    import pyarrow as pa, pyarrow.parquet as pq
    pa.set_cpu_count(1)
    d = f"{BASE}/c{combo}"
    t0 = time.time()
    parts = [pq.read_table(f"{d}/{f}") for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    tbl = pa.concat_tables(parts)
    tr = time.time()
    tbl = tbl.sort_by([("zkey", "ascending")])
    ts = time.time()
    pq.write_table(tbl, f"{d}/out.parquet", compression="zstd")
    tw = time.time()
    os.remove(f"{d}/out.parquet")
    return (tr-t0, ts-tr, tw-ts)

if __name__ == "__main__":
    shutil.rmtree(BASE, ignore_errors=True)
    N_COMBO = 32
    with mp.Pool(16) as p:
        p.map(setup, range(N_COMBO))
    for nproc in (4, 16, 4):
        with mp.Pool(nproc) as p:
            p.map(reduce_task, range(min(nproc, 4)))  # warm
            t0 = time.time()
            res = p.map(reduce_task, range(N_COMBO))
            wall = time.time() - t0
        r = np.array(res)
        print(f"nproc={nproc}: wall {wall:.2f}s | task-sec totals read {r[:,0].sum():.2f} sort {r[:,1].sum():.2f} write {r[:,2].sum():.2f}")
    shutil.rmtree(BASE, ignore_errors=True)
