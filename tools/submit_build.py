"""Cluster job driver for the index build — the `ray job submit` entry.

On a real cluster:

    ray job submit --working-dir /path/to/repo -- \
        python tools/submit_build.py \
            --pages s3://bucket/pages/ --index /shared/index_v1 \
            --tokenize-concurrency 768

The script attaches to the submitting cluster (``address="auto"`` under a
job, local otherwise — never re-initialising an existing session, per the
driver contract), runs the full resumable build, and prints the build
metrics plus the per-stage lineage as its job output.  Re-submitting the
same job after a failure resumes from the last complete stage
(``_SUCCESS`` markers + lineage.jsonl), so a pre-empted job is re-run,
not restarted.

Sandbox note: this repo is developed against a single-node
``address="local"`` Ray; the submit path is exercised with plain
``python tools/submit_build.py`` there, which runs the identical code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True, help="pages parquet dir/file")
    p.add_argument("--index", required=True, help="output index dir")
    p.add_argument(
        "--tokenize-concurrency",
        type=int,
        default=None,
        help="tokenizer actor pool size (default: 3/4 of cluster CPUs)",
    )
    p.add_argument("--num-segments", type=int, default=None)
    p.add_argument(
        "--no-resume",
        action="store_true",
        help="rebuild every stage even if _SUCCESS markers exist",
    )
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS is set by the job runtime;
        # standalone it falls back to a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"))

    from myaku_ray.pipelines.build import DEFAULT_NUM_SEGMENTS, build_index

    cpus = int(ray.cluster_resources().get("CPU", 4))
    kwargs = {}
    if args.num_segments is not None:
        kwargs["num_segments"] = args.num_segments
    else:
        kwargs["num_segments"] = DEFAULT_NUM_SEGMENTS
    metrics = build_index(
        args.pages,
        args.index,
        tokenize_concurrency=(
            args.tokenize_concurrency
            if args.tokenize_concurrency is not None
            else max(3 * cpus // 4, 1)
        ),
        resume=not args.no_resume,
        **kwargs,
    )
    lineage = []
    lin_path = os.path.join(args.index, "lineage.jsonl")
    if os.path.exists(lin_path):
        with open(lin_path) as f:
            lineage = [json.loads(line) for line in f if line.strip()]
    print(json.dumps({"metrics": metrics, "lineage": lineage}, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
