"""Stream-shaped custom operators over the events log (driver brief:
windowed aggregates / sessionization are the canonical "operator Ray Data
lacks" examples — implemented as map_batches + bucketed groupby
compositions, per the documented partitioning assumption).

Ray Data has no event-time windows; the events table is treated as an
ordered, partitioned log: tumbling windows reduce per (user, window) via a
per-batch combiner + small groupby; sessions require all of a user's events
together and in ts order, so rows co-locate by hash(user) bucket and each
group sessionizes its users with vectorized pandas. Both have exact DuckDB
oracles (__ray_entry__).

Scale contract (round 5): every bucketed operator derives its bucket
count from the INPUT SIZE (``derived_buckets`` — one bucket per ~256k
events, floor 16), so per-bucket memory stays constant as the log grows;
group UDFs emit Arrow (pandas-format blocks feed Ray's sort shuffle ~8x
slower than Arrow blocks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Max, Min, Sum

HOUR_US = 3_600_000_000  # microseconds

NUM_BUCKETS = 16  # floor; real runs derive the count from input size
ROWS_PER_BUCKET = 262_144


def derived_buckets(events_ds, floor: int = NUM_BUCKETS,
                    rows_per_bucket: int = ROWS_PER_BUCKET) -> int:
    """Bucket count proportional to the log size (cheap metadata count
    for parquet inputs): per-bucket volume ≈ ``rows_per_bucket`` events,
    constant as the corpus grows — no fixed B at scale."""
    return max(floor, int(events_ds.count()) // rows_per_bucket + 1)


def _from_pandas(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    return pa.Table.from_pandas(df[[f.name for f in schema]], schema=schema,
                                preserve_index=False)


def tumbling_window_agg(events_ds, window_hours: int = 6):
    """Per (user_id, tumbling window): n events, sum/min/max value.
    Combiner-first: per-batch partial rows, then a small groupby-aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        values = batch.column("value").to_numpy(zero_copy_only=False)
        window = (ts // (window_hours * HOUR_US)).astype(np.int64)
        df = pd.DataFrame({"user_id": users, "window_id": window, "value": values})
        g = df.groupby(["user_id", "window_id"], sort=False).agg(
            n_events=("value", "size"),
            sum_value=("value", "sum"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "window_id"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
    )


def sessionize(events_ds, gap_minutes: int = 120,
               num_buckets: int | None = None,
               time_bucket_hours: int | None = None):
    """Session assignment (gap > gap_minutes starts a new session) →
    per-session rows (user_id, session_idx, n_events, start/end ts).

    Default path assumes all events of one user fit in one group — rows
    co-locate by hash(user_id) bucket and each bucket's users sessionize
    independently with sorted pandas.

    ``time_bucket_hours`` removes that assumption for hot users (the
    round-2 skew caveat): events first sessionize inside
    (user bucket, time bucket) groups — a hot user's months of events
    split across many bounded groups — then a SECOND, tiny exchange over
    the per-(user, time-bucket) SESSION rows merges sessions that span a
    bucket boundary (next.start - prev.end <= gap is exactly the
    event-level rule, since those are the boundary-adjacent events) and
    renumbers per user. Output is identical to the one-group path by
    construction (pytest-asserted); session rows per user are bounded by
    activity periods, never event counts."""
    gap_us = gap_minutes * 60 * 1_000_000
    num_buckets = num_buckets or derived_buckets(events_ds)

    def bucketize(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array((users % num_buckets).astype(np.int32)),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts").cast(pa.int64()),
                "value": batch.column("value"),
            }
        )

    _SESSION_SCHEMA = pa.schema([
        ("user_id", pa.int64()), ("session_idx", pa.int64()),
        ("n_events", pa.int64()), ("start_ts", pa.int64()),
        ("end_ts", pa.int64()), ("sum_value", pa.float64())])

    def sessions_in_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            # empty partitions arrive with NO columns; emit the typed empty
            # table so downstream RefBundles keep one schema
            return _SESSION_SCHEMA.empty_table()
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts"].diff() > gap_us
        session_start = (new_user | gap).astype(int)
        df["session_idx"] = session_start.groupby(df["user_id"]).cumsum() - 1
        g = df.groupby(["user_id", "session_idx"], sort=True).agg(
            n_events=("ts", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
            sum_value=("value", "sum"),
        ).reset_index()
        return _from_pandas(g, _SESSION_SCHEMA)

    if time_bucket_hours is None:
        return (
            events_ds.map_batches(bucketize, batch_format="pyarrow",
                                  batch_size=None)
            .groupby("bucket")
            .map_groups(sessions_in_bucket, batch_format="pandas")
        )

    tb_us = time_bucket_hours * HOUR_US

    def bucketize_tb(batch: pa.Table) -> pa.Table:
        out = bucketize(batch)
        ts = out.column("ts").to_numpy(zero_copy_only=False)
        return out.append_column(
            "tbucket", pa.array((ts // tb_us).astype(np.int64)))

    def merge_user_sessions(df: pd.DataFrame) -> pa.Table:
        """Phase 2 over SESSION rows: per user, merge boundary-adjacent
        partial sessions (start - prev_end <= gap) and renumber."""
        if df.empty:
            return _SESSION_SCHEMA.empty_table()
        df = df.sort_values(["user_id", "start_ts"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["start_ts"] - df["end_ts"].shift() > gap_us
        sid = (new_user | gap).cumsum()
        g = df.groupby(sid, sort=False).agg(
            user_id=("user_id", "first"),
            n_events=("n_events", "sum"),
            start_ts=("start_ts", "min"),
            end_ts=("end_ts", "max"),
            sum_value=("sum_value", "sum"),
        ).reset_index(drop=True)
        g["session_idx"] = g.groupby("user_id", sort=False).cumcount()
        return _from_pandas(g, _SESSION_SCHEMA)

    partial_sessions = (
        events_ds.map_batches(bucketize_tb, batch_format="pyarrow",
                              batch_size=None)
        .groupby(["bucket", "tbucket"])
        .map_groups(sessions_in_bucket, batch_format="pandas")
    )
    # the second exchange moves only session rows (≪ events); re-derive
    # the user bucket for co-location
    def rebucket(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        if len(users) == 0:
            return batch.append_column("bucket", pa.array([], pa.int32()))
        return batch.append_column(
            "bucket", pa.array((users % num_buckets).astype(np.int32)))

    return (
        partial_sessions.map_batches(rebucket, batch_format="pyarrow",
                                     batch_size=None)
        .groupby("bucket")
        .map_groups(merge_user_sessions, batch_format="pandas")
    )


def event_type_stats(events_ds):
    """Per event_type counts + value sum (simple wide aggregate)."""
    return events_ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
    )


def hopping_window_agg(events_ds, window_hours: int = 6, hop_hours: int = 3):
    """Hopping (overlapping sliding) window aggregate: each event belongs
    to window_size/hop windows; the event stream is EXPLODED to
    (user, window) partial rows inside the batch combiner, then a small
    keyed aggregate — same combiner-first shape as the tumbling window,
    with fan-out bounded by the window/hop ratio."""
    window_us = window_hours * 3600 * 1_000_000
    hop_us = hop_hours * 3600 * 1_000_000
    # ceil, not floor: when hop doesn't divide the window (e.g. 6h/4h) an
    # event can fall inside ceil(window/hop) candidate windows; floor would
    # silently aggregate a shorter window than labeled. Candidates beyond
    # the true membership are filtered below (w*hop + window > ts).
    n_hops = max(1, -(-window_us // hop_us))

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        values = batch.column("value").to_numpy(zero_copy_only=False)
        first = ts // hop_us - (n_hops - 1)
        # candidate window ids in [ts//hop - n_hops + 1, ts//hop]; window w
        # spans [w*hop, w*hop + window_us) — keep candidates that truly
        # cover ts (always all of them when hop divides window).
        window = np.concatenate([first + k for k in range(n_hops)])
        ts_rep = np.tile(ts, n_hops)
        keep = window * hop_us + window_us > ts_rep
        df = pd.DataFrame({
            "user_id": np.tile(users, n_hops)[keep],
            "window_id": window[keep],
            "value": np.tile(values, n_hops)[keep],
        })
        g = df.groupby(["user_id", "window_id"], sort=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "window_id"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )

def asof_join(left_ds, right_ds, on: str = "ts", by: str = "user_id",
              left_cols: tuple[str, ...] = ("event_id",),
              right_cols: tuple[str, ...] = ("event_id",),
              num_buckets: int | None = None, right_prefix: str = "r_"):
    """As-of join (backward, inclusive): each left row is matched with the
    single right row of the same ``by`` key whose ``on`` value is the
    greatest one <= the left row's ``on`` value. Inner semantics — left
    rows with no prior right row are dropped.

    Ray Data has no asof/range join; the operator co-locates both sides by
    hash(by) bucket (ONE small exchange — the same partitioning assumption
    as `sessionize`) and runs vectorized `pandas.merge_asof` per bucket.
    The bucket count derives from the combined input size, so per-bucket
    memory is constant at cluster scale; a hot key would need the
    time-bucket split used by `sessionize(time_bucket_hours)` — asof only
    needs the nearest predecessor, so each time bucket would carry the
    right side's last row of the previous bucket.

    Determinism contract: duplicate right rows on the same (by, on) pair
    are reduced to the one with the smallest first right_col before
    matching (mirrors the SQL oracle's group-wise min), so the matched
    attribution never depends on scan order.
    """
    tiecol = right_cols[0]
    if num_buckets is None:
        # counting TRANSFORMED datasets executes their pipelines once just
        # for the bucket count — callers passing non-trivial inputs should
        # supply num_buckets from a metadata-cheap upper bound instead
        num_buckets = max(NUM_BUCKETS,
                          (int(left_ds.count()) + int(right_ds.count()))
                          // ROWS_PER_BUCKET + 1)

    def bucketize(cols: tuple[str, ...]):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(by).to_numpy(zero_copy_only=False)
            out = {
                "bucket": pa.array((keys % num_buckets).astype(np.int32)),
                by: batch.column(by),
                on: batch.column(on).cast(pa.int64()),
            }
            for c in cols:
                out[c] = batch.column(c)
            return pa.Table.from_pydict(out)
        return fn

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {
                "side": pa.array(np.full(n, side, dtype=np.int8)),
                "bucket": batch.column("bucket"),
                by: batch.column(by),
                on: batch.column(on),
            }
            for c in left_cols:
                cols[c] = (batch.column(c) if side == 0
                           else pa.nulls(n, pa.int64()))
            for c in right_cols:
                cols[right_prefix + c] = (batch.column(c) if side == 1
                                          else pa.nulls(n, pa.int64()))
            return pa.Table.from_pydict(cols)
        return fn

    left_tagged = (left_ds.map_batches(bucketize(left_cols),
                                       batch_format="pyarrow")
                   .map_batches(tag(0), batch_format="pyarrow"))
    right_tagged = (right_ds.map_batches(bucketize(right_cols),
                                         batch_format="pyarrow")
                    .map_batches(tag(1), batch_format="pyarrow"))

    r_on = right_prefix + on
    out_cols = ([by, on, *left_cols]
                + [right_prefix + c for c in right_cols] + [r_on, "gap"])
    out_schema = pa.schema([(c, pa.int64()) for c in out_cols])

    def match(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        left = df[df["side"] == 0][[by, on, *left_cols]]
        right = df[df["side"] == 1][
            [by, on] + [right_prefix + c for c in right_cols]]
        # deterministic tie-break on duplicate (by, on) right rows
        right = (right.sort_values([by, on, right_prefix + tiecol],
                                   kind="mergesort")
                 .drop_duplicates([by, on], keep="first"))
        right[r_on] = right[on]  # survives the merge (on-column is left's)
        left = left.sort_values(on, kind="mergesort")
        right = right.sort_values(on, kind="mergesort")
        m = pd.merge_asof(left, right, on=on, by=by, direction="backward")
        m = m.dropna(subset=[right_prefix + tiecol])
        for c in [right_prefix + c for c in right_cols] + [r_on]:
            m[c] = m[c].astype("int64")
        m["gap"] = m[on] - m[r_on]
        return _from_pandas(m, out_schema)

    return (left_tagged.union(right_tagged)
            .groupby("bucket")
            .map_groups(match, batch_format="pandas"))

def user_running_totals(events_ds, num_buckets: int | None = None):
    """Per-event running aggregates within each user's ts-ordered stream
    (cumulative count + value sum) — the ordered-window operator Ray Data
    lacks. Same hash(user) co-location contract as `sessionize`; inside a
    bucket the cumsum is vectorized pandas in (user, ts) order, which is
    also the only order that makes the float sum deterministic."""
    num_buckets = num_buckets or derived_buckets(events_ds)

    def bucketize(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "bucket": pa.array((users % num_buckets).astype(np.int32)),
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts").cast(pa.int64()),
            "value": batch.column("value"),
        })

    _SCHEMA = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts", pa.int64()), ("running_n", pa.int64()),
        ("running_value", pa.float64())])

    def running(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SCHEMA.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        df["running_n"] = g.cumcount() + 1
        df["running_value"] = g["value"].cumsum()
        return _from_pandas(df, _SCHEMA)

    return (events_ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(running, batch_format="pandas"))


def funnel_stages(events_ds, stages: tuple[str, ...] =
                  ("signup", "click", "purchase"),
                  num_buckets: int | None = None):
    """Ordered funnel: per user, the earliest time each stage completes
    given the PREVIOUS stage completed strictly before it (first signup,
    first click after that signup, first purchase after that click).
    Output: (user_id, stage_idx, stage, first_ts) for reached stages.

    Vectorized as staged groupby-min passes inside each user bucket — the
    SQL oracle's own shape (s0 = min signup; s_{i+1} = min stage-i+1 event
    strictly after s_i) — no per-user Python loop."""
    num_buckets = num_buckets or derived_buckets(events_ds)

    def bucketize(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "bucket": pa.array((users % num_buckets).astype(np.int32)),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts").cast(pa.int64()),
            "event_type": batch.column("event_type"),
        })

    _SCHEMA = pa.schema([
        ("user_id", pa.int64()), ("stage_idx", pa.int64()),
        ("stage", pa.string()), ("first_ts", pa.int64())])

    def funnel(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SCHEMA.empty_table()
        outs = []
        prev: pd.Series | None = None  # user_id -> completion ts of prev stage
        for idx, stage in enumerate(stages):
            sel = df[df["event_type"] == stage]
            if prev is not None:
                gate = sel["user_id"].map(prev)
                sel = sel[sel["ts"] > gate]  # NaN gate -> False, drops user
            if sel.empty:
                break
            cur = sel.groupby("user_id")["ts"].min()
            outs.append(pd.DataFrame({
                "user_id": cur.index.to_numpy(),
                "stage_idx": np.int64(idx),
                "stage": stage,
                "first_ts": cur.to_numpy(),
            }))
            prev = cur
        if not outs:
            return _SCHEMA.empty_table()
        return _from_pandas(pd.concat(outs, ignore_index=True), _SCHEMA)

    return (events_ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(funnel, batch_format="pandas"))

def value_quantiles_by_type(events_ds,
                            qpcts: tuple[int, ...] = (25, 50, 75, 90)):
    """Exact per-group quantiles of event value. Contract: nearest-rank,
    k = ceil(n*q) via integer arithmetic from percent points
    (k = (n*qpct + 99) // 100) — the SQL twin joins on the same integer
    rank, so no float-product tie ambiguity. One groupby(event_type)
    exchange; a hot type at cluster scale would move to the value-count
    combiner shape used by doc_length_quantiles."""

    _SCHEMA = pa.schema([("event_type", pa.string()), ("q", pa.float64()),
                         ("value", pa.float64())])

    def quant(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SCHEMA.empty_table()
        df = df.sort_values("value", kind="mergesort")
        vals = df["value"].to_numpy()
        n = len(vals)
        rows = pd.DataFrame(
            [(df["event_type"].iloc[0], qpct / 100.0,
              float(vals[(n * qpct + 99) // 100 - 1])) for qpct in qpcts],
            columns=[f.name for f in _SCHEMA])
        return _from_pandas(rows, _SCHEMA)

    return (events_ds.groupby("event_type")
            .map_groups(quant, batch_format="pandas"))

def burst_windows(events_ds, window_hours: int = 6):
    """Burst detection over tumbling windows: a (event_type, window) is a
    burst when its count exceeds 2x the type's mean window rate. The
    comparison is ALL-INTEGER (n * n_windows > 2 * total) so the surface
    carries no float at all. Two small exchanges: per-(type, window)
    counts (combiner-first), then a per-type rollup broadcast back onto
    the window rows via a self-groupby."""
    window_us = window_hours * HOUR_US

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "window_id": (ts // window_us).astype(np.int64),
        })
        g = (df.groupby(["event_type", "window_id"], sort=False)
             .size().rename("n_events").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (events_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None)
              .groupby(["event_type", "window_id"])
              .aggregate(Sum("n_events", alias_name="n_events")))

    _SCHEMA = pa.schema([
        ("event_type", pa.string()), ("window_id", pa.int64()),
        ("n_events", pa.int64()), ("is_burst", pa.int64())])

    def flag(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SCHEMA.empty_table()
        total = int(df["n_events"].sum())
        nw = len(df)
        df = df.copy()
        df["is_burst"] = (df["n_events"] * nw > 2 * total).astype("int64")
        return _from_pandas(df, _SCHEMA)

    return counts.groupby("event_type").map_groups(
        flag, batch_format="pandas")

WEEK_US = 7 * 24 * HOUR_US


def retention_cohorts(events_ds, num_buckets: int | None = None):
    """Weekly retention cohorts: users grouped by first-event week; for
    each (cohort_week, week_offset) the number of cohort users active in
    that week. Two exchanges: hash(user) co-location to derive each
    user's cohort + active weeks, then a tiny (cohort, offset) count."""
    num_buckets = num_buckets or derived_buckets(events_ds)

    def bucketize(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "bucket": pa.array((users % num_buckets).astype(np.int32)),
            "user_id": batch.column("user_id"),
            "week": pa.array((ts // WEEK_US).astype(np.int64)),
        })

    _SCHEMA = pa.schema([("cohort_week", pa.int64()),
                         ("week_offset", pa.int64()),
                         ("user_id", pa.int64())])

    def user_weeks(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SCHEMA.empty_table()
        df = df.drop_duplicates(["user_id", "week"])
        first = df.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame({"cohort_week": first,
                            "week_offset": df["week"] - first,
                            "user_id": df["user_id"]})
        return _from_pandas(out, _SCHEMA)

    rows = (events_ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(user_weeks, batch_format="pandas"))
    return rows.groupby(["cohort_week", "week_offset"]).aggregate(
        Count(alias_name="n_users"))
