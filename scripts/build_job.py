#!/usr/bin/env python
"""Cluster job entrypoint: build (or resume) an index, optionally pack
and query it — the ``ray job submit`` path the engine is designed for.

On a multi-node cluster::

    ray job submit --working-dir . -- \
        python scripts/build_job.py \
            --src s3://bucket/transcripts/ --index-dir /shared/ix \
            --mode fused --compound --queries queries.txt

Locally (the sandbox / CI path — same code, local address)::

    RAY_ADDRESS=local python scripts/build_job.py \
        --src /root/testdata/sf0.001 --index-dir /tmp/ix_job

The script owns the Ray session (guarded init, shutdown at exit),
re-runs are resumable (per-partition lineage skips committed segments),
and it prints ONE JSON line of build metrics + per-query latencies on
stdout so the job log is machine-readable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True,
                    help="parquet path(s) of the transcripts table")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--mode", default="fused",
                    choices=["fused", "stream", "spill", "twobranch"])
    ap.add_argument("--seg-size", type=int, default=None,
                    help="docs per segment (default: auto)")
    ap.add_argument("--conv-col", default="conv_id")
    ap.add_argument("--turn-col", default="turn_idx")
    ap.add_argument("--no-resume", action="store_true",
                    help="rebuild every partition even if committed")
    ap.add_argument("--compound", action="store_true",
                    help="pack each sealed segment into one segment.cmpd")
    ap.add_argument("--queries", default=None,
                    help="file of query strings (QueryParser syntax), "
                         "one per line, run after the build")
    ap.add_argument("--limit", type=int, default=10)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime injects the cluster address
        # (and --working-dir ships the package); standalone runs fall
        # back to a local session and ship the repo root to workers
        repo_root = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True,
                 runtime_env={"env_vars": {"PYTHONPATH": repo_root
                              + os.pathsep
                              + os.environ.get("PYTHONPATH", "")}})

    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.state.schema import transcripts_schema

    t0 = time.time()
    manifest = build_index(
        args.src, args.index_dir, transcripts_schema(),
        seg_size=args.seg_size, conv_col=args.conv_col,
        turn_col=args.turn_col, resume=not args.no_resume,
        mode=args.mode, compound=args.compound)
    out = {
        "build_secs": round(time.time() - t0, 3),
        "segments": len(manifest.segments),
        "docs": manifest.doc_count_all,
        "resumed_segments": manifest.settings.get("resumed_segments"),
        "mode": args.mode,
        "compound": args.compound,
    }

    if args.queries:
        from whoosh_ray.search.dist import QueryPool
        from whoosh_ray.search.qparser import QueryParser

        parser = QueryParser("text", transcripts_schema())
        with open(args.queries) as f:
            qs = [parser.parse(line.strip()) for line in f
                  if line.strip()]
        lat = {}
        with QueryPool(args.index_dir) as pool:
            pool.search_batch(qs, limit=args.limit)  # warm actor stats
            t0 = time.time()
            results = pool.search_batch(qs, limit=args.limit)
            lat["queryset_secs"] = round(time.time() - t0, 3)
        lat["n_queries"] = len(qs)
        lat["n_hits"] = int(results.num_rows)
        out["queries"] = lat

    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
