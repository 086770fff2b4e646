"""Smoke the ``ray job submit`` entrypoint (scripts/build_job.py) as a
SUBPROCESS: it owns its own Ray session (RAY_ADDRESS=local), builds,
packs, queries via the QueryPool, prints one JSON metrics line, and a
re-run resumes every committed segment."""

import json
import os
import subprocess
import sys

from whoosh_ray.sources.transcripts import write_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(args):
    env = dict(os.environ, RAY_ADDRESS="local")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_job.py")]
        + args, capture_output=True, text=True, env=env, cwd=REPO,
        timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_build_job_entrypoint(tmp_path):
    src = write_transcripts(str(tmp_path / "src"), n_convs=60)
    ix = str(tmp_path / "ix")
    qfile = tmp_path / "queries.txt"
    qfile.write_text("deploy\ndeploy AND render\n\"deploy render\"\n")

    m = _run_job(["--src", src, "--index-dir", ix, "--compound",
                  "--seg-size", "128", "--queries", str(qfile)])
    assert m["segments"] > 0 and m["docs"] > 0
    assert m["compound"] is True
    assert m["queries"]["n_queries"] == 3
    assert m["queries"]["n_hits"] > 0

    # re-run: per-partition lineage resumes every sealed segment
    m2 = _run_job(["--src", src, "--index-dir", ix, "--seg-size", "128"])
    assert m2["resumed_segments"] == m["segments"]
    assert m2["docs"] == m["docs"]
