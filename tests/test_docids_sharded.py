"""Two-level range-partitioned docid bases (stages/docids.py).

The sharded head must (a) produce bases byte-identical to the
single-level prefix sum, (b) never materialize the full conv-key array
on the driver, and (c) feed file-level lineage with identical ranges.
"""

import glob

import numpy as np
import pyarrow.parquet as pq
import ray

from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.stages.docids import (ShardedBases, conv_bases_local,
                                      conv_bases_submit, conv_bases_collect,
                                      file_docid_ranges,
                                      file_docid_ranges_sharded,
                                      sharded_bases_collect,
                                      sharded_bases_submit, with_docids)


def _write_parts(tmp_path, n_convs=900, seed=11, n_files=12):
    t = generate_transcripts(n_convs=n_convs, seed=seed)
    src = tmp_path / "src"
    src.mkdir()
    per = (t.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(t.slice(i * per, per),
                       str(src / f"part{i:02d}.parquet"))
    return sorted(glob.glob(str(src / "part*.parquet"))), t


def _dense_bases(sb: ShardedBases):
    """Reassemble the full (keys, bases) pair from the bucket blobs —
    TEST-ONLY; production code never does this on the driver."""
    keys_parts, bases_parts = [], []
    for b, ref in enumerate(sb.blob_refs):
        kb, lb = ray.get(ref)
        keys_parts.append(kb)
        bases_parts.append(lb + sb.bucket_base[b])
    return np.concatenate(keys_parts), np.concatenate(bases_parts)


def test_sharded_bases_match_single_level(ray_session, tmp_path):
    paths, _ = _write_parts(tmp_path)
    keys1, bases1, span1 = conv_bases_local(paths)
    sb, fspans = sharded_bases_collect(
        sharded_bases_submit(paths), n_buckets=5)

    assert sb.span == span1
    keys2, bases2 = _dense_bases(sb)
    assert keys2.astype(keys1.dtype).tolist() == keys1.tolist()
    np.testing.assert_array_equal(bases2, bases1)

    # driver-side state is K-sized, not #convs-sized
    n_convs = len(keys1)
    assert len(sb.boundaries) + 1 == len(sb.blob_refs)
    assert len(sb.boundaries) < n_convs // 4
    assert len(sb.bucket_base) == len(sb.blob_refs)

    # vectorized lookup through the bucket fan-out agrees
    got = sb.assign_uniq(keys1.astype(f"S{sb.width}"), fetch=ray.get)
    np.testing.assert_array_equal(got, bases1)

    # every bucket actually holds a disjoint slice (ranges honored)
    for b, ref in enumerate(sb.blob_refs):
        kb, _ = ray.get(ref)
        if len(kb) == 0:
            continue
        if b > 0:
            assert kb[0] >= sb.boundaries[b - 1]
        if b < len(sb.boundaries):
            assert kb[-1] < sb.boundaries[b]


def test_with_docids_sharded_parity(ray_session, tmp_path):
    paths, _ = _write_parts(tmp_path, n_convs=500, seed=3)
    ds = ray.data.read_parquet(paths)
    sb, _ = sharded_bases_collect(sharded_bases_submit(paths), n_buckets=4)

    d1, span1 = with_docids(ds, local_paths=paths)
    d2, span2 = with_docids(ds, bases_sharded=sb)
    assert span1 == span2 == sb.span
    p1 = d1.to_pandas().sort_values(["conv_id", "turn_idx"])
    p2 = d2.to_pandas().sort_values(["conv_id", "turn_idx"])
    assert p1["docid"].tolist() == p2["docid"].tolist()
    # docids are a dense rank: 0..span-1 exactly once
    u = np.sort(p1["docid"].to_numpy())
    assert u[0] == 0 and u[-1] == span1 - 1 and len(np.unique(u)) == len(u)


def test_file_docid_ranges_sharded_parity(ray_session, tmp_path):
    paths, _ = _write_parts(tmp_path, n_convs=700, seed=5, n_files=9)
    k, b, span, fspans1 = conv_bases_collect(conv_bases_submit(paths))
    r1 = file_docid_ranges(k, b, span, fspans1, paths)
    sb, fspans2 = sharded_bases_collect(sharded_bases_submit(paths),
                                        n_buckets=3)
    r2 = file_docid_ranges_sharded(sb, fspans2, paths)
    assert fspans1 == fspans2
    assert r1 == r2
