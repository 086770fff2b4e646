"""All build modes must produce BYTE-identical segments: the mode is an
execution strategy (sort-shuffle fused / posting-only spill / direct
actor routing / two-branch), never a semantic choice."""

import os

import pyarrow.parquet as pq
import pytest

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


@pytest.mark.parametrize("mode", ["stream", "spill", "twobranch"])
def test_mode_matches_fused_bytes(tmp_path, mode):
    (tmp_path / "src").mkdir()
    pq.write_table(generate_transcripts(n_convs=300, seed=21),
                   str(tmp_path / "src" / "p.parquet"))
    src = str(tmp_path / "src")
    ref = str(tmp_path / "fused")
    build_index(src, ref, transcripts_schema(), seg_size=512)
    other = str(tmp_path / mode)
    build_index(src, other, transcripts_schema(), seg_size=512, mode=mode)

    segs = sorted(os.listdir(ref + "/segments"))
    assert segs == sorted(os.listdir(other + "/segments"))
    for sd in segs:
        for fname in ("terms.parquet", "docs.parquet"):
            a = pq.read_table(f"{ref}/segments/{sd}/{fname}")
            b = pq.read_table(f"{other}/segments/{sd}/{fname}")
            assert a.equals(b), (mode, sd, fname)
