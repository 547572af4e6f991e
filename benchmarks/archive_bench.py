#!/usr/bin/env python
"""Archive-path A/B: synchronous vs background-thread archiving, end to end
through Datagen (sampling + guarded evolution + D2H + downsample + HDF5).

The async archiver (pipeline/datagen.py) moves per-run downsample + disk IO
off the critical path so it overlaps the next batch's device compute — the
role the native AsyncNpyWriter plays for --format npy. The reference's
store_snapshot_online + save loop is synchronous (nlse_dev.hpp:323-334).

Prints one JSON line with both wall times and the speedup.
"""

import json
import shutil
import tempfile
import time

N = 256
NT = 500
SNAPSHOTS = 64
RUNS = 16
BATCH = 4


_SHARED_TRAJ = []      # one compiled executable serves every sweep


def sweep(archive_async, archive_format="hdf5", runs=RUNS):
    from nlsolvers_tpu.pipeline.datagen import Datagen, DatagenConfig

    tmp = tempfile.mkdtemp(prefix="archive_bench_")
    try:
        cfg = DatagenConfig(
            family="nlse", phenomenon="multi_soliton", system="cubic",
            nx=N, Lx=10.0, T=1.2 * NT / 2000, nt=NT, snapshots=SNAPSHOTS,
            num_runs=runs, batch_size=BATCH, krylov_m=20, seed=0,
            output_dir=tmp, archive_async=archive_async,
            archive_format=archive_format)
        dg = Datagen(cfg)
        # all sweeps share identical static config, so reuse the first
        # sweep's jitted executable instead of re-tracing per Datagen
        if _SHARED_TRAJ:
            dg.traj_fn = _SHARED_TRAJ[0]
        else:
            _SHARED_TRAJ.append(dg.traj_fn)
        t0 = time.perf_counter()
        written = dg.run()
        wall = time.perf_counter() - t0
        assert len(written) == runs, f"only {len(written)} archived"
        return wall
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    # warm the compile (tiny sweep, same executable)
    sweep(True, runs=BATCH)
    t_async = sweep(True)
    t_sync = sweep(False)
    t_npy = sweep(True, archive_format="npy")
    print(json.dumps({
        "metric": f"nlse2d_datagen_{N}sq_nt{NT}_archive_wall_s",
        "sync_hdf5_s": round(t_sync, 2),
        "async_hdf5_s": round(t_async, 2),
        "async_npy_s": round(t_npy, 2),
        "value": round(t_sync / t_async, 3),
        "unit": "speedup (sync/async, hdf5)",
        "vs_baseline": round(t_sync / t_async, 3),
    }))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, ".")
    main()
