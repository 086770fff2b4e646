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


def test_stream_buffer_actor_exactly_once(ray_session, tmp_path):
    """A re-executed map task re-delivers its slices; finalize must
    drop duplicate posting rows AND duplicate stored docids exactly
    (the stream mode's exactly-once contract).  Driven directly on the
    SegmentBufferActor class (plain object, no Ray indirection)."""
    import os

    import pyarrow.parquet as pq

    from whoosh_ray.sources.transcripts import generate_transcripts
    from whoosh_ray.stages.docids import with_docids
    from whoosh_ray.stages.stream_writer import (SegmentBufferActor,
                                                 _slice_by_seg)
    from whoosh_ray.stages.tokenize import TokenizePostings
    from whoosh_ray.state.schema import transcripts_schema

    t = generate_transcripts(n_convs=40, seed=17)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    import ray.data
    ds = ray.data.read_parquet(str(src))
    ds, span = with_docids(ds, conv_col="conv_id", turn_col="turn_idx")
    import pyarrow as pa

    batch = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)

    schema = transcripts_schema()
    tok = TokenizePostings(schema, seg_size=10_000)
    post = tok(batch)
    post_slices = _slice_by_seg(post, post["seg"].to_numpy())
    keep = {f.name for f in schema.fields if f.stored}
    keep.update(schema.stored_columns)
    docs = batch.select(["docid"] + [c for c in batch.column_names
                                     if c in keep])
    doc_slices = _slice_by_seg(docs, batch["docid"].to_numpy() // 10_000)

    def run(n_deliveries):
        ix = str(tmp_path / f"ix{n_deliveries}")
        os.makedirs(os.path.join(ix, "segments"))
        actor = SegmentBufferActor(ix, schema.to_json())
        for _ in range(n_deliveries):
            actor.add(post_slices, doc_slices)
        rows = actor.finalize()
        segdir = os.path.join(ix, "segments", "seg=00000")
        return (rows,
                pq.read_table(os.path.join(segdir, "docs.parquet")),
                pq.read_table(os.path.join(segdir, "terms.parquet")))

    r1, d1, t1 = run(1)
    r2, d2, t2 = run(2)  # duplicated delivery
    assert d1.equals(d2)
    assert t1.equals(t2)
    assert r1[0]["doc_count"] == r2[0]["doc_count"] == batch.num_rows
    assert r1[0]["n_postings"] == r2[0]["n_postings"]
