"""Event-time window operators: gap sessionization and as-of join.

Beyond the reference's own surface (it has no event-stream operators) —
these are the streaming-window / temporal-join members of the
training-data-pipeline op set, built on the repo's standard grouping
idiom (one hash exchange + block-local vectorized kernel,
``el/shuffle.py::group_blocks``).

Partitioning assumption (both ops): all rows of one ``by`` key co-reside
after the exchange — required because a session window / as-of match
needs the key's full timeline. Keys are users, so skew is bounded by a
single user's history; at 100 TB the replacement is time-chunked
sessionization with boundary-session merge, which this module's
block kernel would serve unchanged per chunk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle import group_blocks

SESSION_GAP_US = 30 * 60 * 1_000_000  # classic 30-minute inactivity gap


def _session_block(gap_us: int):
    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "session_no": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="datetime64[us]"),
                "session_end": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype="int64"),
                "sum_value": pd.Series(dtype="float64"),
            })
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        uid = df["user_id"].to_numpy()
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        island = np.cumsum(new_sess)  # global 1-based session island
        # per-user numbering: island minus the user's first island, +1
        run_starts = np.flatnonzero(new_user)
        run_lens = np.diff(np.append(run_starts, len(df)))
        sess_no = island - np.repeat(island[run_starts], run_lens) + 1
        out = df.assign(session_no=sess_no).groupby(
            ["user_id", "session_no"], as_index=False).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "size"), sum_value=("value", "sum"))
        out["session_no"] = out["session_no"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return block


def sessionize(events_ds, gap_us: int = SESSION_GAP_US, *,
               num_partitions: int | None = None):
    """Gap-based session windows per user: one hash exchange on
    ``user_id``, then block-local gaps-and-islands (vectorized cumsum
    over the sorted timeline). Ties broken by ``event_id`` so the
    result is deterministic and SQL-replayable.

    In: (event_id, ts, user_id, value). Out one row per session:
    (user_id, session_no, session_start, session_end, n_events,
    sum_value[2dp])."""
    from .textstats import round_half_away

    base = _session_block(gap_us)

    def block(df: pd.DataFrame) -> pd.DataFrame:
        out = base(df)
        out["sum_value"] = round_half_away(out["sum_value"], 2)
        return out

    return group_blocks(events_ds, ["user_id"], block,
                        batch_format="pandas",
                        num_partitions=num_partitions)


def sessionize_chunked(events_ds, gap_us: int = SESSION_GAP_US, *,
                       chunk_us: int = 24 * 3600 * 1_000_000,
                       num_partitions: int | None = None):
    """The skew-safe 100-TB shape of :func:`sessionize`: no partition
    ever holds one user's full EVENT timeline.

    Phase 1 — event-scale exchange on ``(user_id, time-chunk)``; each
    block sessionizes its chunks locally (sessions never cross a chunk
    edge here). Phase 2 — SESSION-scale exchange on ``user_id``; chain
    consecutive local sessions whose boundary gap <= ``gap_us`` (the
    gap between two adjacent local sessions is exactly
    ``next.session_start - prev.session_end``, so chaining reproduces
    the single-pass semantics bit-for-bit), then number per user and
    round. Equivalence with :func:`sessionize` is pytest-gated on
    random streams with chunk < gap (chunks cutting mid-session)."""
    from .textstats import round_half_away

    def add_chunk(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False) \
              .astype("datetime64[us]").astype("int64")
        return t.append_column("chunk", pa.array(ts // chunk_us))

    ev = events_ds.map_batches(add_chunk, batch_format="pyarrow")

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="datetime64[us]"),
                "session_end": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype="int64"),
                "sum_value": pd.Series(dtype="float64"),
            })
        df = df.sort_values(["user_id", "chunk", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        uid = df["user_id"].to_numpy()
        ch = df["chunk"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (ch[1:] != ch[:-1]) \
            | ((ts[1:] - ts[:-1]) > gap_us)
        out = df.assign(island=np.cumsum(new)).groupby(
            ["user_id", "island"], as_index=False).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "size"), sum_value=("value", "sum"))
        out["n_events"] = out["n_events"].astype("int64")
        return out.drop(columns=["island"])

    local_sessions = group_blocks(ev, ["user_id", "chunk"], local,
                                  batch_format="pandas",
                                  num_partitions=num_partitions)

    def chain(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "session_no": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="datetime64[us]"),
                "session_end": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype="int64"),
                "sum_value": pd.Series(dtype="float64"),
            })
        df = df.sort_values(["user_id", "session_start"],
                            kind="mergesort", ignore_index=True)
        uid = df["user_id"].to_numpy()
        start = df["session_start"].to_numpy() \
            .astype("datetime64[us]").astype("int64")
        end = df["session_end"].to_numpy() \
            .astype("datetime64[us]").astype("int64")
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new = new_user.copy()
        new[1:] |= (start[1:] - end[:-1]) > gap_us
        island = np.cumsum(new)
        run_starts = np.flatnonzero(new_user)
        run_lens = np.diff(np.append(run_starts, len(df)))
        sess_no = island - np.repeat(island[run_starts], run_lens) + 1
        out = df.assign(session_no=sess_no).groupby(
            ["user_id", "session_no"], as_index=False).agg(
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        out["session_no"] = out["session_no"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = round_half_away(out["sum_value"], 2)
        return out

    return group_blocks(local_sessions, ["user_id"], chain,
                        batch_format="pandas",
                        num_partitions=num_partitions)


def asof_join(left_ds, right_ds, *, by: str, on: str,
              right_cols: dict[str, str],
              num_partitions: int | None = None):
    """As-of (backward, inclusive) join: each left row picks the latest
    right row of the same ``by`` key with ``right.on <= left.on``; left
    rows with no such row keep nulls (LEFT semantics, matching DuckDB's
    ``ASOF LEFT JOIN``).

    Plan: tag sides into one dataset (right payload columns pre-renamed
    via ``right_cols`` src->out, nulls on the opposite side), ONE hash
    exchange on ``by``, then a block-local merge: lexsort by
    (key, on, side) with rights first at ties, running maximum of
    last-seen-right index, validity = matched right shares the key.
    Fully vectorized — no per-row loop, one pass per block."""
    n = num_partitions
    out_names = list(right_cols.values())

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__side", pa.array(
            np.ones(t.num_rows, dtype=np.int8)))
        for o in out_names:
            t = t.append_column(o, pa.nulls(t.num_rows))
        return t

    left_cols = [c for c in left_ds.schema().names]
    right_schema = right_ds.schema()

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {by: t.column(by), on: t.column(on)}
        for src, o in right_cols.items():
            cols[o] = t.column(src)
        out = pa.table(cols)
        out = out.append_column("__side", pa.array(
            np.zeros(t.num_rows, dtype=np.int8)))
        for c in left_cols:
            if c not in (by, on):
                out = out.append_column(c, pa.nulls(t.num_rows))
        return out

    # union needs one schema: resolve the null placeholder types from
    # the two sides' real schemas before tagging
    left_schema = left_ds.schema()
    ltypes = dict(zip(left_schema.names, left_schema.types))
    rtypes = dict(zip(right_schema.names, right_schema.types))
    out_types = {o: rtypes[src] for src, o in right_cols.items()}

    def cast_full(t: pa.Table) -> pa.Table:
        fields = [(c, ltypes[c]) for c in left_cols] + \
                 [("__side", pa.int8())] + \
                 [(o, out_types[o]) for o in out_names]
        arrays = [t.column(c).cast(typ) for c, typ in fields]
        return pa.table({c: a for (c, _), a in zip(fields, arrays)})

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow") \
                .map_batches(cast_full, batch_format="pyarrow")
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow") \
                 .map_batches(cast_full, batch_format="pyarrow")
    both = lt.union(rt)

    def merge(t: pa.Table) -> pa.Table:
        out_fields = [(c, ltypes[c]) for c in left_cols] + \
                     [(o, out_types[o]) for o in out_names]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=typ)
                             for c, typ in out_fields})
        codes = pd.factorize(
            t.column(by).to_numpy(zero_copy_only=False))[0]
        ts = t.column(on).to_numpy(zero_copy_only=False) \
              .astype("datetime64[us]").astype("int64")
        side = t.column("__side").to_numpy(zero_copy_only=False)
        o = np.lexsort((side, ts, codes))
        s_side, s_codes = side[o], codes[o]
        ridx = np.where(s_side == 0, np.arange(len(o)), -1)
        seen = np.maximum.accumulate(ridx)
        lpos = np.flatnonzero(s_side == 1)
        m = seen[lpos]
        valid = (m >= 0) & (s_codes[np.clip(m, 0, None)] == s_codes[lpos])
        left_orig = pa.array(o[lpos])
        right_orig = np.where(valid, o[np.clip(m, 0, None)], 0)
        vmask = pa.array(valid)
        cols = {c: t.column(c).take(left_orig) for c in left_cols}
        for oname in out_names:
            taken = t.column(oname).take(pa.array(right_orig))
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            cols[oname] = pc.if_else(vmask, taken,
                                     pa.scalar(None, taken.type))
        return pa.table(cols)

    return group_blocks(both, [by], merge, batch_format="pyarrow",
                        num_partitions=n)


# ------------------------------------------------------ hopping windows
HOP_US = 15 * 60 * 1_000_000          # 15-minute hop
WINDOW_US = 4 * HOP_US                # 1-hour window (4 hops)


def _hop_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Combiner: explode each event into its window_size/hop overlapping
    windows and pre-aggregate inside the batch. Window starts are hop
    multiples s with s <= ts < s + window (exactly window/hop of them,
    since window is a whole number of hops)."""
    if len(df) == 0:
        return pd.DataFrame({"event_type": pd.Series(dtype=str),
                             "window_start_us": pd.Series(dtype="int64"),
                             "n_events": pd.Series(dtype="int64"),
                             "sum_value": pd.Series(dtype="float64")})
    tu = df["ts"].values.astype("datetime64[us]").astype("int64")
    base = (tu // HOP_US) * HOP_US
    k = WINDOW_US // HOP_US
    ex = pd.DataFrame({
        "event_type": np.repeat(df["event_type"].to_numpy(), k),
        "window_start_us": (np.repeat(base, k)
                            - np.tile(np.arange(k, dtype=np.int64) * HOP_US,
                                      len(df))),
        "value": np.repeat(df["value"].to_numpy(), k),
    })
    out = ex.groupby(["event_type", "window_start_us"],
                     as_index=False).agg(n_events=("value", "size"),
                                         sum_value=("value", "sum"))
    out["n_events"] = out["n_events"].astype("int64")
    return out


def hopping_window_agg(events_ds):
    """Hopping (sliding) window aggregate: per (event_type, 1-hour
    window sliding by 15 min) event counts and value sums. Combiner ->
    one hash exchange on (event_type, window_start) -> block-local
    merge; integer epoch-us window keys through the shuffle."""

    partials = events_ds.map_batches(_hop_partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        from ..ops.textstats import round_half_away

        if len(df) == 0:
            return pd.DataFrame({"event_type": pd.Series(dtype=str),
                                 "window_start_us": pd.Series(dtype="int64"),
                                 "n_events": pd.Series(dtype="int64"),
                                 "sum_value": pd.Series(dtype="float64")})
        out = df.groupby(["event_type", "window_start_us"],
                         as_index=False).agg(n_events=("n_events", "sum"),
                                             sum_value=("sum_value", "sum"))
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = round_half_away(out["sum_value"], 4)
        return out

    return group_blocks(partials, ["event_type", "window_start_us"],
                        merge, batch_format="pandas")


# ---------------------------------------------------------- funnel
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(events_ds, steps: tuple[str, ...] = FUNNEL_STEPS, *,
           num_partitions: int | None = None):
    """Ordered funnel conversion per user: a user completes step k iff
    events of types ``steps[0..k]`` occur at strictly increasing
    (ts, event_id) positions in their timeline (same-tuple ties never
    advance the funnel). One hash exchange on ``user_id``, then a
    block-local VECTORIZED scan: one first-reach pass per funnel step
    over the sorted partition (no per-user Python loop).

    Same partitioning assumption as ``sessionize`` (a user's timeline
    co-resides after the exchange; skew bounded by one user's
    history). Out: one row per user —
    (user_id, steps_completed, converted)."""

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "steps_completed": pd.Series(dtype="int64"),
                "converted": pd.Series(dtype="bool")})
        df = df.sort_values(["user_id", "ts", "event_id"])
        uid_codes, users = pd.factorize(df["user_id"], sort=True)
        etype = df["event_type"].to_numpy()
        n, n_users = len(df), len(users)
        pos = np.arange(n)
        big = n  # sentinel: step not reached
        # start "before any event" (candidates are already user-matched)
        reach = np.full(n_users, -1)
        completed = np.zeros(n_users, dtype=np.int64)
        for k, st in enumerate(steps):
            cand_mask = (etype == st) & (pos > reach[uid_codes])
            cand = pos[cand_mask]
            uids_c = uid_codes[cand_mask]
            uniq, first_idx = np.unique(uids_c, return_index=True)
            new_reach = np.full(n_users, big)
            new_reach[uniq] = cand[first_idx]
            completed[uniq] = k + 1
            reach = new_reach
        return pd.DataFrame({
            "user_id": np.asarray(users, dtype=np.int64),
            "steps_completed": completed,
            "converted": completed == len(steps)})

    return group_blocks(
        events_ds.select_columns(["user_id", "ts", "event_id",
                                  "event_type"]),
        ["user_id"], block, batch_format="pandas",
        num_partitions=num_partitions)


# ------------------------------------------------------ interval join
def interval_join(events_ds, intervals_ds, *, by: str = "user_id",
                  ts_col: str = "ts", start_col: str = "session_start",
                  end_col: str = "session_end",
                  keep_cols: tuple[str, ...] = ("session_no",),
                  num_partitions: int | None = None):
    """Range (interval-containment) join: each event row matches the
    ``by``-key interval with ``start <= ts <= end``. Both sides meet in
    ONE tagged-union hash exchange on ``by``; block-locally the match
    is a C-speed ``pd.merge_asof`` (latest start <= ts per key) plus an
    end-bound filter — valid because intervals are NON-OVERLAPPING per
    key (the sessionization invariant; an overlapping-interval join
    would need a sweep instead). Inner-join semantics: events outside
    every interval are dropped.

    Out: (by, event_id, ts, *keep_cols). Key / id / keep-col dtypes are
    DERIVED from the two input schemas (the ``by`` key unifies to the
    events side's type), so string keys and non-int64 payload columns
    produce consistently-typed blocks — including on partitions holding
    only one side."""
    def _arrow_type(t):
        # Dataset.schema() yields Arrow types for Arrow blocks but
        # numpy dtypes for pandas blocks; normalize (object -> string,
        # the pandas string representation)
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    ev_schema = events_ds.schema()
    iv_schema = intervals_ds.schema()
    ev_types = {n: _arrow_type(t)
                for n, t in zip(ev_schema.names, ev_schema.types)}
    iv_types = {n: _arrow_type(t)
                for n, t in zip(iv_schema.names, iv_schema.types)}
    by_t = ev_types[by]
    eid_t = ev_types["event_id"]
    keep_t = {k: iv_types[k] for k in keep_cols}

    def tag_events(t: pa.Table) -> pa.Table:
        cols = {by: t.column(by).cast(by_t),
                ts_col: t.column(ts_col).cast(pa.timestamp("us")),
                "event_id": t.column("event_id"),
                "is_event": pa.array([1] * t.num_rows, pa.int64())}
        cols[start_col] = pa.nulls(t.num_rows, pa.timestamp("us"))
        cols[end_col] = pa.nulls(t.num_rows, pa.timestamp("us"))
        for k in keep_cols:
            cols[k] = pa.nulls(t.num_rows, keep_t[k])
        return pa.table(cols)

    def tag_intervals(t: pa.Table) -> pa.Table:
        cols = {by: t.column(by).cast(by_t),
                ts_col: pa.nulls(t.num_rows, pa.timestamp("us")),
                "event_id": pa.nulls(t.num_rows, eid_t),
                "is_event": pa.array([0] * t.num_rows, pa.int64()),
                start_col: t.column(start_col).cast(pa.timestamp("us")),
                end_col: t.column(end_col).cast(pa.timestamp("us"))}
        for k in keep_cols:
            cols[k] = t.column(k)
        return pa.table(cols)

    tagged = (events_ds.select_columns([by, ts_col, "event_id"])
              .map_batches(tag_events, batch_format="pyarrow")
              .union(intervals_ds.map_batches(tag_intervals,
                                              batch_format="pyarrow")))

    out_cols = [by, "event_id", ts_col, *keep_cols]
    empty_schema = pa.schema(
        [(by, by_t), ("event_id", eid_t), (ts_col, pa.timestamp("us"))]
        + [(k, keep_t[k]) for k in keep_cols])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        empty = empty_schema.empty_table().to_pandas()
        ev = df[df["is_event"] == 1]
        iv = df[df["is_event"] == 0]
        if len(ev) == 0 or len(iv) == 0:
            return empty
        ev = ev[[by, "event_id", ts_col]].sort_values(ts_col,
                                                      kind="mergesort")
        iv = iv[[by, start_col, end_col, *keep_cols]].sort_values(
            start_col, kind="mergesort")
        j = pd.merge_asof(ev, iv, left_on=ts_col, right_on=start_col,
                          by=by, direction="backward")
        j = j[j[ts_col] <= j[end_col]]
        out = j[out_cols].copy()
        want = empty.dtypes
        for k in ["event_id", *keep_cols]:
            out[k] = out[k].astype(want[k])
        return out.reset_index(drop=True)

    return group_blocks(tagged, [by], block, batch_format="pandas",
                        num_partitions=num_partitions)


def hopping_distinct(events_ds, *, num_partitions: int | None = None):
    """EXACT distinct users per (event_type, 1h-window-sliding-15min)
    — the two-exchange distributed COUNT(DISTINCT) shape: each event
    explodes into its 4 covering windows and dedupes (type, window,
    user) inside the batch; exchange 1 hashes the full TRIPLE so every
    copy of a (type, window, user) co-resides and collapses to one
    count-partial row per (type, window) per partition; exchange 2
    sums the tiny partials. The exchange-1 volume is the corpus's
    distinct-triple count (inherent to exact distinct — a cheaper
    answer at 100 TB is the KMV sketch, el/ops/sketch.py).

    Out: (event_type, window_start_us, n_users)."""
    from ..shuffle import group_blocks

    k = WINDOW_US // HOP_US

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=str),
                "window_start_us": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64")})
        tu = df["ts"].values.astype("datetime64[us]").astype("int64")
        base = (tu // HOP_US) * HOP_US
        out = pd.DataFrame({
            "event_type": np.repeat(df["event_type"].to_numpy(), k),
            "window_start_us": (np.repeat(base, k)
                                - np.tile(np.arange(k, dtype=np.int64)
                                          * HOP_US, len(df))),
            "user_id": np.repeat(df["user_id"].to_numpy(), k),
        })
        return out.drop_duplicates()

    triples = events_ds.select_columns(
        ["event_type", "user_id", "ts"]).map_batches(
        explode, batch_format="pandas")

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=str),
                "window_start_us": pd.Series(dtype="int64"),
                "n_users": pd.Series(dtype="int64")})
        out = (df.drop_duplicates()
               .groupby(["event_type", "window_start_us"],
                        as_index=False).size()
               .rename(columns={"size": "n_users"}))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    partials = group_blocks(
        triples, ["event_type", "window_start_us", "user_id"],
        count_partial, batch_format="pandas",
        num_partitions=num_partitions)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=str),
                "window_start_us": pd.Series(dtype="int64"),
                "n_users": pd.Series(dtype="int64")})
        out = df.groupby(["event_type", "window_start_us"],
                         as_index=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return group_blocks(partials, ["event_type", "window_start_us"],
                        total, batch_format="pandas",
                        num_partitions=num_partitions)


# --------------------------------------------------- cohort retention
def cohort_retention(events_ds, offsets: tuple[int, ...] = (0, 1, 7), *,
                     num_partitions: int | None = None):
    """Cohort retention: users are cohorted by their first-seen day;
    for each cohort and ``offset`` k, count users active on day
    cohort+k. Two exchanges: per-batch distinct (user, day) partials
    meet on ``user_id`` (a user's full day-set co-resides, so cohort =
    local min), emitting at most one (cohort, k, user) row per offset;
    then a count combiner meets on (cohort_day, day_offset). Out:
    (cohort_day, day_offset, users) — zero-count cells omitted."""
    offs = sorted(set(int(k) for k in offsets))

    def days_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "day": pd.Series(dtype="datetime64[us]")})
        out = df[["user_id"]].copy()
        out["day"] = df["ts"].dt.floor("D")
        return out.drop_duplicates()

    partials = events_ds.select_columns(["user_id", "ts"]).map_batches(
        days_partial, batch_format="pandas")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "cohort_day": pd.Series(dtype="datetime64[us]"),
            "day_offset": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        df = df.drop_duplicates()
        cohort = df.groupby("user_id")["day"].transform("min")
        k = (df["day"] - cohort).dt.days.astype("int64")
        m = k.isin(offs)
        return pd.DataFrame({
            "cohort_day": cohort[m].to_numpy(),
            "day_offset": k[m].to_numpy(),
            "user_id": df.loc[m, "user_id"].to_numpy()})

    rows = group_blocks(partials, ["user_id"], per_user,
                        batch_format="pandas",
                        num_partitions=num_partitions)

    # each (cohort, k, user) row is unique by construction, so counts
    # are plain sizes: combiner then one small exchange
    def part_cnt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort_day", "day_offset"],
                         as_index=False).size().rename(
            columns={"size": "users"})
        out["users"] = out["users"].astype("int64")
        return out

    def merge_cnt(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "cohort_day": pd.Series(dtype="datetime64[us]"),
                "day_offset": pd.Series(dtype="int64"),
                "users": pd.Series(dtype="int64")})
        out = df.groupby(["cohort_day", "day_offset"],
                         as_index=False)["users"].sum()
        out["users"] = out["users"].astype("int64")
        return out

    return group_blocks(rows.map_batches(part_cnt,
                                         batch_format="pandas"),
                        ["cohort_day", "day_offset"], merge_cnt,
                        batch_format="pandas")
