"""North-rule resumability demo with a REAL process kill.

A worker process runs a per-tile aggregation pipeline at sf0.01 as a
sequence of work-unit jobs (unit = hash bucket of the level-8 tile id,
the resumable quantum — a date/cell-range partition in production).
Each unit writes its output parquet and a per-partition lineage
checkpoint (plans/checkpoints.py).  The orchestrator:

1. runs an uninterrupted baseline worker (golden output + wall time);
2. starts a fresh worker and SIGKILLs it after ~half the units have
   checkpointed (a genuine mid-job crash: no atexit, no cleanup);
3. restarts the worker, which consults resume_filter and processes
   only the remaining units;
4. verifies the combined killed+resumed output is EXACTLY the baseline
   output (sorted row hash) and reports the resume delta — the wall
   time the restart spent vs a from-scratch rerun.

Run: python tools/kill_resume_demo.py [sf_dir] [n_units] [cpus]
"""

from __future__ import annotations

import hashlib
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGE = "tile_counts_l8"


def worker(sf_dir: str, out_dir: str, cp_path: str, n_units: int,
           cpus: int) -> None:
    """Process remaining work units one job at a time, checkpointing
    after each; exits 0 when no units remain."""
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.functions import cell_parent
    from s2_geometry_rust_spark.plans.checkpoints import (
        resume_filter,
        write_stage_checkpoint,
    )
    from s2_geometry_rust_spark.session import get_spark
    from s2_geometry_rust_spark.sources import (
        extract_geo_points,
        synth_documents,
    )

    spark = get_spark("kill-resume-worker", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic interleaved corpus sized off the sf documents table
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs = synth_documents(spark, n_docs, seed=7, partitions=cpus * 4)
    pts = extract_geo_points(docs)
    tiles = pts.withColumn("tile_id", cell_parent("cell_id", 8)).withColumn(
        # deterministic bucket: resume repartitions identically
        "unit_id", F.pmod(F.xxhash64("tile_id"), F.lit(n_units)).cast("long")
    )

    units = [
        r["unit_id"]
        for r in resume_filter(
            tiles.select("unit_id").distinct(), spark, STAGE, cp_path,
            "unit_id",
        ).orderBy("unit_id").collect()
    ]
    print(f"worker: {len(units)}/{n_units} units remaining", flush=True)
    for u in units:
        sub = tiles.filter(F.col("unit_id") == u)
        agg = sub.groupBy("tile_id").agg(
            F.count("*").alias("n_points"),
            F.countDistinct("doc_id").alias("n_docs"),
        ).withColumn("unit_id", F.lit(u).cast("long"))
        agg.write.mode("overwrite").parquet(f"{out_dir}/unit={u}")
        # checkpoint AFTER the data write commits (crash between the
        # two re-runs the unit — overwrite makes that idempotent)
        write_stage_checkpoint(
            agg.withColumn("cell", F.col("tile_id")), STAGE, "unit_id",
            "cell", cp_path, lineage=f"unit-{u}",
        )
        print(f"worker: unit {u} done", flush=True)
    spark.stop()


def output_hash(out_dir: str) -> tuple[str, int]:
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT tile_id, n_points, n_docs FROM '{out_dir}/unit=*/*.parquet' "
        "ORDER BY tile_id"
    ).fetchall()
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return h, len(rows)


def spawn(sf_dir: str, out_dir: str, cp: str, n_units: int,
          cpus: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", sf_dir,
         out_dir, cp, str(n_units), str(cpus)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def count_checkpointed(cp_path: str) -> int:
    import glob

    import duckdb

    if not glob.glob(f"{cp_path}/*.parquet"):
        return 0
    return duckdb.connect().execute(
        f"SELECT count(DISTINCT unit_id) FROM '{cp_path}/*.parquet' "
        "WHERE unit_id >= 0"
    ).fetchone()[0]


def main(sf_dir: str = "/root/testdata/sf0.01", n_units: int = 12,
         cpus: int = 8) -> None:
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="kill_resume_")
    golden_out, golden_cp = f"{base}/golden/out", f"{base}/golden/cp"
    out, cp = f"{base}/run/out", f"{base}/run/cp"

    # 1. uninterrupted baseline
    t0 = time.time()
    p = spawn(sf_dir, golden_out, golden_cp, n_units, cpus)
    p.communicate()
    assert p.returncode == 0
    baseline_s = time.time() - t0
    golden_hash, golden_rows = output_hash(golden_out)

    # 2. fresh worker, SIGKILL once half the units are checkpointed
    t0 = time.time()
    p = spawn(sf_dir, out, cp, n_units, cpus)
    target = n_units // 2
    while count_checkpointed(cp) < target:
        if p.poll() is not None:
            raise RuntimeError("worker finished before kill threshold")
        time.sleep(0.3)
    os.kill(p.pid, signal.SIGKILL)
    p.wait()
    killed_s = time.time() - t0
    done_at_kill = count_checkpointed(cp)
    assert p.returncode == -signal.SIGKILL

    # 3. restart: resume_filter re-runs only the gap
    t0 = time.time()
    p = spawn(sf_dir, out, cp, n_units, cpus)
    stdout, _ = p.communicate()
    assert p.returncode == 0
    resume_s = time.time() - t0
    remaining = next(
        int(line.split()[1].split("/")[0])
        for line in stdout.splitlines() if "units remaining" in line
    )

    # 4. killed+resumed output == uninterrupted output, bit for bit
    got_hash, got_rows = output_hash(out)
    assert got_hash == golden_hash, (got_hash, golden_hash)
    assert remaining == n_units - done_at_kill

    print({
        "sf_dir": sf_dir, "n_units": n_units,
        "units_done_at_kill": done_at_kill,
        "units_resumed": remaining,
        "baseline_wall_s": round(baseline_s, 1),
        "killed_run_wall_s": round(killed_s, 1),
        "resume_wall_s": round(resume_s, 1),
        "resume_delta_vs_full_rerun_s": round(baseline_s - resume_s, 1),
        "output_rows": got_rows, "output_hash": got_hash,
        "exact_match": True,
    })
    shutil.rmtree(base)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5]),
               int(sys.argv[6]))
    else:
        args = sys.argv[1:]
        main(args[0] if args else "/root/testdata/sf0.01",
             int(args[1]) if len(args) > 1 else 12,
             int(args[2]) if len(args) > 2 else 8)
