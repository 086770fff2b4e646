"""Stream-shaped ops over the events table (ordered, partitioned log).

Ray Data has no event-time windows; per the reference's model (no
streaming features at all, SURVEY.md §2.14) these are batch pipelines
over a keyed, time-sorted log: ``groupby(key).map_groups`` with the
windowing done vectorized inside the sorted group.  Ordering assumption:
events of one key fit one group and are sorted by ``ts`` inside it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def sessionize(ds: ray.data.Dataset, *, key: str = "user_id",
               ts_col: str = "ts", gap_us: int = SESSION_GAP_US) -> ray.data.Dataset:
    """Split each key's event stream into sessions at gaps > ``gap_us``.

    Output: one row per session with count/min/max/sum aggregates."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].astype("int64").to_numpy()
        new_session = np.empty(len(ts), dtype=bool)
        new_session[0] = True
        np.greater(ts[1:] - ts[:-1], gap_us, out=new_session[1:])
        sid = np.cumsum(new_session) - 1
        out = (g.assign(session=sid)
                .groupby("session")
                .agg(n_events=(ts_col, "size"),
                     start_ts=(ts_col, "min"),
                     end_ts=(ts_col, "max"),
                     sum_value=("value", "sum"))
                .reset_index())
        out[key] = g[key].iloc[0]
        return out[[key, "session", "n_events", "start_ts", "end_ts",
                    "sum_value"]]

    per_key.__name__ = "per_key"
    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def tumbling_window_counts(ds: ray.data.Dataset, *, ts_col: str = "ts",
                           width_us: int = 3_600_000_000,
                           value_col: str = "value") -> ray.data.Dataset:
    """Tumbling event-time windows: counts + sums per window bucket.

    Pre-aggregates per batch (map-side combine) before the small
    groupby — the aggregate-at-scale pattern."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy()
        w = (ts // width_us).astype(np.int64)
        v = batch[value_col].to_numpy()
        uw, inv = np.unique(w, return_inverse=True)
        return pa.table({
            "window": pa.array(uw, type=pa.int64()),
            "n": pa.array(np.bincount(inv), type=pa.int64()),
            "sum_value": pa.array(np.bincount(inv, weights=v),
                                  type=pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return (partials.groupby("window")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_value", alias_name="sum_value")))
