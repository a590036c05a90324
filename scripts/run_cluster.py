"""Cluster entry point for the OCR pipeline — the ``ray job submit`` target.

On a real fixed-size cluster (north_rule: N and 4N nodes):

    ray job submit --working-dir . -- \
        python scripts/run_cluster.py \
            --input  s3://bucket/pages/  (or any dir of pages parquet) \
            --output s3://bucket/out/ \
            --files-per-shard 64

Behavior:
- connects to the running cluster (``ray.init(address="auto")``) — or a
  local session with --local-cpus N for single-node runs;
- drives zerox_ray.state.manifest.CheckpointedOcrRunner: per-shard
  output + atomic lineage manifests, so re-submitting the SAME command
  after a failure resumes from the last completed shard;
- prints a one-line JSON run summary (docs, pages, errors, pages/sec)
  aggregated over this submission's shards.

Single-node smoke (what CI runs):
    python scripts/run_cluster.py --input <pages-dir> --output /tmp/out \
        --local-cpus 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable from any cwd: the repo root (parent of scripts/) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="dir of pages-*.parquet")
    ap.add_argument("--output", required=True, help="output root (shards + manifests)")
    ap.add_argument("--files-per-shard", type=int, default=64)
    ap.add_argument("--input-format", choices=["parquet", "warc"],
                    default="parquet",
                    help="pages parquet (default) or raw .warc/.warc.gz")
    ap.add_argument("--maintain-format", action="store_true")
    ap.add_argument("--error-mode", choices=["IGNORE", "THROW"], default="IGNORE")
    ap.add_argument("--model-provider", default="deterministic")
    ap.add_argument("--max-shards", type=int, default=None,
                    help="process at most N pending shards (canary runs)")
    ap.add_argument("--local-cpus", type=int, default=None,
                    help="start a local session instead of joining a cluster")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        if args.local_cpus is not None:
            ray.init(address="local", num_cpus=args.local_cpus,
                     include_dashboard=False)
        else:
            ray.init(address="auto")

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    ctx.read_op_min_num_blocks = 2 * ncpu  # see BASELINE.md block tuning

    from zerox_ray.config import ZeroxConfig
    from zerox_ray.state.manifest import CheckpointedOcrRunner

    cfg = ZeroxConfig(
        maintain_format=args.maintain_format,
        error_mode=args.error_mode,
        model_provider=args.model_provider,
    )
    runner = CheckpointedOcrRunner(
        args.input, args.output, cfg,
        files_per_shard=args.files_per_shard,
        input_format=args.input_format,
    )
    t0 = time.perf_counter()
    summary = runner.run(max_shards=args.max_shards)
    wall = time.perf_counter() - t0
    summary["wall_seconds"] = round(wall, 3)
    summary["pages_per_sec"] = round(summary["n_pages"] / wall, 1) if wall else 0.0
    summary["cluster_cpus"] = ncpu
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
