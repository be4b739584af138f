"""KG-construction job entrypoint — ``ray job submit``-compatible.

    ray job submit -- python -m nativeextractor_ray.run_kg \
        --sf-dir /root/testdata/sf0.01 --out /tmp/kg_out --partitions 8

Runs a registered checkpointable pipeline (``--pipeline`` triples /
mentions / dedup_exact / redact) with per-partition checkpointing
(``--resume`` is the default: a killed run picks up where it left off,
skipping every partition whose manifest + input fingerprint check out),
then merges partials into ``<out>/<pipeline>/``.

This module owns its Ray session (guarded — it attaches to the job's
cluster when one exists).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--pipeline", default="triples",
                    choices=["triples", "mentions", "dedup_exact", "redact",
                             "quality_gate"])
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every partition even if checkpointed")
    ap.add_argument("--skip-finalize", action="store_true",
                    help="leave per-partition partials unmerged")
    args = ap.parse_args(argv)

    import os

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 ignore_reinit_error=True)

    from nativeextractor_ray.state.checkpoint import finalize, run_partitioned

    summary = run_partitioned(
        args.sf_dir,
        args.out,
        n_partitions=args.partitions,
        pipeline=args.pipeline,
        resume=not args.no_resume,
        replicate=args.replicate,
    )
    if not args.skip_finalize:
        final = finalize(args.out, pipeline=args.pipeline)
        final.write_parquet(f"{args.out}/{args.pipeline}")
        summary["final_rows"] = final.count()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
