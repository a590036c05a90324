"""Kill/resume soak at bench scale (sf0.1): prove the checkpointed runner
survives a hard SIGKILL mid-run and that resume produces BYTE-IDENTICAL
final documents vs an uninterrupted run, skipping completed shards.

Protocol (each phase is its own OS process with its own Ray session):
1. reshard the cached sf0.1 pages table into 16 url-hash input files
   (one row per url, so the all-rows-of-a-url-in-one-shard resume
   assumption holds by construction);
2. phase A: uninterrupted CheckpointedOcrRunner run → out_a;
3. phase B1: same run into out_b, SIGKILLed (whole process group) at
   ~40% of A's wall-clock;
4. phase B2: rerun the same command → completes only pending shards;
5. compare every (url, markdown, total_pages, ocr_successful,
   ocr_failed) row of out_a vs out_b.

Usage: python scripts/resume_soak.py            # full soak, prints JSON
       python scripts/resume_soak.py --phase run --input D --out D2
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time
import zlib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/zx_resume_soak"
N_INPUT_FILES = 16


def prepare_input() -> str:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    import pyarrow as pa

    sys.path.insert(0, ROOT)
    from zerox_ray.testgen import pages_dir_for

    src = pages_dir_for(SF_DIR)
    dst = os.path.join(WORK, "input")
    if glob.glob(os.path.join(dst, "*.parquet")):
        return dst
    os.makedirs(dst, exist_ok=True)
    tables = [pq.read_table(f) for f in sorted(glob.glob(src + "/*.parquet"))]
    t = pa.concat_tables(tables)
    buckets = [
        zlib.crc32(u.encode()) % N_INPUT_FILES for u in t["url"].to_pylist()
    ]
    barr = pa.array(buckets, pa.int64())
    for b in range(N_INPUT_FILES):
        part = t.filter(pc.equal(barr, b))
        pq.write_table(part, os.path.join(dst, f"pages-{b:04d}.parquet"))
    return dst


def phase_run(input_dir: str, out_dir: str) -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    sys.path.insert(0, ROOT)
    from zerox_ray.state.manifest import CheckpointedOcrRunner

    runner = CheckpointedOcrRunner(input_dir, out_dir, files_per_shard=1)
    summary = runner.run()
    print("RUN_SUMMARY " + json.dumps(summary), flush=True)
    ray.shutdown()


def read_docs(out_dir: str):
    import pyarrow.parquet as pq
    import pandas as pd

    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    return df.sort_values("url").reset_index(drop=True)


def spawn(input_dir: str, out_dir: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, __file__, "--phase", "run", "--input", input_dir, "--out", out_dir],
        cwd=ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # SIGKILL the whole group (driver + raylet)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="soak")
    ap.add_argument("--input")
    ap.add_argument("--out")
    args = ap.parse_args()
    if args.phase == "run":
        phase_run(args.input, args.out)
        return

    input_dir = prepare_input()
    out_a = os.path.join(WORK, "out_a")
    out_b = os.path.join(WORK, "out_b")
    for d in (out_a, out_b):
        subprocess.run(["rm", "-rf", d], check=True)

    t0 = time.perf_counter()
    pa_run = spawn(input_dir, out_a)
    out, _ = pa_run.communicate()
    wall_a = time.perf_counter() - t0
    assert pa_run.returncode == 0, out
    summary_a = json.loads(out.split("RUN_SUMMARY ", 1)[1])

    # phase B1: hard-kill mid-run. The interesting kill window is after
    # SOME shards committed but not all — Ray startup eats the first
    # seconds, so poll manifests and kill once a few exist.
    t0 = time.perf_counter()
    pb = spawn(input_dir, out_b)
    mglob = os.path.join(out_b, "_manifests", "*.json")
    deadline = t0 + 3 * wall_a
    while time.perf_counter() < deadline:
        if len(glob.glob(mglob)) >= 3 or pb.poll() is not None:
            break
        time.sleep(0.05)
    if pb.poll() is None:
        os.killpg(os.getpgid(pb.pid), signal.SIGKILL)
    pb.wait()
    kill_after = round(time.perf_counter() - t0, 2)
    manifests_after_kill = len(glob.glob(mglob))

    # phase B2: resume — must skip completed shards and finish the rest
    pb2 = spawn(input_dir, out_b)
    out2, _ = pb2.communicate()
    assert pb2.returncode == 0, out2
    summary_b2 = json.loads(out2.split("RUN_SUMMARY ", 1)[1])

    a = read_docs(out_a)
    b = read_docs(out_b)
    cols = ["url", "markdown", "total_pages", "ocr_successful", "ocr_failed"]
    identical = len(a) == len(b) and all(
        (a[c].to_numpy() == b[c].to_numpy()).all() for c in cols
    )
    n_shards = len(glob.glob(os.path.join(out_a, "shard=*")))
    report = {
        "sf_dir": SF_DIR,
        "input_files": N_INPUT_FILES,
        "shards": n_shards,
        "wall_a_sec": round(wall_a, 2),
        "killed_after_sec": kill_after,
        "manifests_at_kill": manifests_after_kill,
        "resume_processed_shards": summary_b2["processed_shards"],
        "resume_skipped_shards": summary_b2["skipped_shards"],
        "docs_a": len(a),
        "docs_b": len(b),
        "byte_identical": bool(identical),
        "resume_skipped_completed_work": manifests_after_kill > 0
        and len(summary_b2["processed_shards"])
        == n_shards - manifests_after_kill,
    }
    print(json.dumps(report))
    assert identical, "resumed output differs from uninterrupted run"


if __name__ == "__main__":
    main()
