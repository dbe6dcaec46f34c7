"""Windowed aggregation over the ``events`` stream table.

Tumbling 1-hour windows per event_type — the streaming-window custom
operator expressed as composition (SURVEY custom-operator rule (a)):
partial per-batch aggregation inside ``map_batches`` (user-dedup +
count/sum combine), then one ``groupby(window, event_type)`` shuffle whose
groups carry pre-collapsed rows, not raw events. Exact distinct-user
counts survive because partials keep one row per (window, type, user).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from .common import round6, shuffle_partitions

WINDOW_US = 3_600_000_000  # 1 hour


def events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def q_windowed_events(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = batch["ts"].cast(pa.int64())
        win = pc.multiply(pc.divide(ts, WINDOW_US), WINDOW_US)  # int division
        t = pa.table(
            {
                "window_start": win,
                "event_type": batch["event_type"],
                "user_id": batch["user_id"],
                "value": batch["value"],
            }
        )
        # Arrow-native hash aggregate (was a pandas groupby — round-2
        # VERDICT style note); output keeps metadata-free schemas so Ray's
        # sort-reduce concat can hash them
        g = pa.TableGroupBy(
            t, ["window_start", "event_type", "user_id"]
        ).aggregate([("value", "count"), ("value", "sum")])
        g = g.rename_columns(
            ["cnt" if c == "value_count" else "sv" if c == "value_sum" else c
             for c in g.column_names]
        )
        return g.replace_schema_metadata(None)

    def finalize(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "window_start": pa.array(
                    [int(group["window_start"][0].as_py())], pa.timestamp("us")
                ),
                "event_type": pa.array(
                    [group["event_type"][0].as_py()], pa.string()
                ),
                "n_events": pa.array(
                    [int(pc.sum(group["cnt"]).as_py())], pa.int64()
                ),
                "n_users": pa.array(
                    [int(pc.count_distinct(group["user_id"]).as_py())],
                    pa.int64(),
                ),
                "sum_value": pa.array(
                    [float(round6(pc.sum(group["sv"]).as_py()))], pa.float64()
                ),
            }
        )

    return (
        rd.read_parquet(events_path(sf_dir),
                        columns=["ts", "user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .map_groups(finalize, batch_format="pyarrow")
    )


def q_user_sessions(sf_dir: str):
    """Sessionization (30-min inactivity gap) per user — the stateful
    streaming-window shape: co-locate each user's events, scan ordered by
    ts. Returns per-user session count + max session length.

    Segment-vectorized (``common.segmented_group_map``): user groups are
    tiny and numerous (the crawl-log shape at web scale), so the session
    scan runs across every user of a hash bucket at once — session breaks
    are a boolean mask over the (user, ts)-sorted rows, per-user counts and
    maxima are reduceat segments."""
    GAP_US = 1_800_000_000

    def sessions_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "max_session_events": pa.array([], pa.int64()),
                }
            )
        ts = tbl["ts"].cast(pa.int64()).to_numpy()
        # a row opens a new session iff it starts its user's segment or
        # follows a gap > GAP_US within the segment
        new_sess = np.zeros(n, dtype=bool)
        new_sess[starts] = True
        new_sess[1:] |= (ts[1:] - ts[:-1]) > GAP_US
        counts = np.diff(np.r_[starts, n])
        n_sessions = np.add.reduceat(new_sess.astype(np.int64), starts)
        sess_idx = np.nonzero(new_sess)[0]
        sess_len = np.diff(np.r_[sess_idx, n])
        # sessions lie contiguously within users; each user's first session
        # starts exactly at its segment start
        offs = np.searchsorted(sess_idx, starts)
        max_len = np.maximum.reduceat(sess_len, offs)
        return pa.table(
            {
                "user_id": tbl["user_id"].take(pa.array(starts)),
                "n_events": pa.array(counts, pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "max_session_events": pa.array(max_len, pa.int64()),
            }
        )

    from .common import segmented_group_map, strip_schema_metadata

    return segmented_group_map(
        rd.read_parquet(events_path(sf_dir), columns=["ts", "user_id"]).map_batches(
            strip_schema_metadata, batch_format="pyarrow"
        ),
        "user_id",
        sessions_bucket,
        num_partitions=shuffle_partitions(),
        sort_keys=[("user_id", "ascending"), ("ts", "ascending")],
    )


ASOF_LEFT = "purchase"   # rows being enriched
ASOF_RIGHT = "click"     # reference stream: latest prior row attaches


def _count_le_lex(
    ru: np.ndarray, rts: np.ndarray, qu: np.ndarray, qts: np.ndarray
) -> np.ndarray:
    """For every query i: the number of reference rows with
    ``(ru, rts) <=lex (qu[i], qts[i])``, reference sorted by (ru, rts).

    One merged lexsort over references + queries (ties: references first)
    — each query's merged position minus the queries preceding it IS that
    count. Replaces a per-user binary search with two O((R+Q) log) kernels,
    so both custom joins run as ONE vectorized call per hash bucket."""
    n_r = ru.size
    u = np.concatenate([ru, qu])
    t = np.concatenate([rts, qts])
    side = np.concatenate(
        [np.zeros(n_r, np.int8), np.ones(qu.size, np.int8)]
    )
    order = np.lexsort((side, t, u))
    pos = np.empty(order.size, np.int64)
    pos[order] = np.arange(order.size)
    is_q = np.zeros(order.size, np.int64)
    is_q[pos[n_r:]] = 1
    q_before = np.r_[0, np.cumsum(is_q)[:-1]]
    qpos = pos[n_r:]
    return qpos - q_before[qpos]


def q_asof_join(sf_dir: str):
    """AS-OF join — the time-series operator Ray Data has no primitive for,
    expressed as composition (SURVEY custom-operator rule (a)): every
    ``purchase`` event is joined to the LATEST ``click`` of the same user
    with click.ts <= purchase.ts (ties: highest click event_id). INNER
    as-of: purchases with no prior click are dropped — the output stays
    null-free, which keeps the driver's value-hash comparison exact
    (NaT/NaN never compare equal).

    Shape: ONE read of the events table filtered to the two types inside
    the map (column- and row-pruned before any shuffle), one user-bucketed
    shuffle (``common.segmented_group_map`` — one UDF call per hash
    bucket, not per user), and a bucket-wide merged rank count
    (``_count_le_lex``) that finds every purchase's as-of click across
    all the bucket's users at once. Partitioning assumption (same as
    sessionize): a hash bucket of users fits in a task — at 100 TB a
    pathological user would need a ts-range sub-split. SQL-oracle-checked
    against a window-ranked left join (deterministic, unlike a bare ASOF
    JOIN whose equal-ts choice is unspecified)."""

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(
            t["event_type"],
            value_set=pa.array([ASOF_LEFT, ASOF_RIGHT], pa.string()),
        )
        return t.filter(mask)

    def merge_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        import pyarrow.compute as pc

        # rows arrive sorted by (user_id, ts, event_id); clicks of a user
        # are therefore (ts, event_id)-sorted — the as-of index for every
        # purchase across ALL users of the bucket comes from one merged
        # rank count (_count_le_lex), equal ts -> max event_id
        is_l = pc.equal(tbl["event_type"], ASOF_LEFT).to_numpy(
            zero_copy_only=False
        )
        ids = tbl["event_id"].to_numpy()
        ts = tbl["ts"].cast(pa.int64()).to_numpy()
        val = tbl["value"].to_numpy()
        users = tbl["user_id"].to_numpy()
        lid, lts, lval, lu = ids[is_l], ts[is_l], val[is_l], users[is_l]
        rid, rts, ru = ids[~is_l], ts[~is_l], users[~is_l]
        if ru.size == 0:
            # no reference rows in this bucket: inner join yields nothing
            lid = lts = lval = lu = idx = np.empty(0, np.int64)
            hit = np.empty(0, bool)
        else:
            idx = _count_le_lex(ru, rts, lu, lts) - 1
            hit = (idx >= 0) & (ru[np.maximum(idx, 0)] == lu)
        lid, lts, lval, lu, idx = (
            lid[hit], lts[hit], lval[hit], lu[hit], idx[hit],
        )
        click_id = rid[idx]
        click_ts = rts[idx]
        return pa.table(
            {
                "event_id": pa.array(lid, pa.int64()),
                "user_id": pa.array(lu, pa.int64()),
                "ts": pa.array(lts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(lval, pa.float64()),
                "click_event_id": pa.array(click_id, pa.int64()),
                "click_ts": pa.array(click_ts, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "lag_us": pa.array(lts - click_ts, pa.int64()),
            }
        )

    from .common import segmented_group_map, strip_schema_metadata

    return segmented_group_map(
        rd.read_parquet(
            events_path(sf_dir),
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        .map_batches(strip_schema_metadata, batch_format="pyarrow")
        .map_batches(keep, batch_format="pyarrow"),
        "user_id",
        merge_bucket,
        num_partitions=shuffle_partitions(),
        sort_keys=[
            ("user_id", "ascending"),
            ("ts", "ascending"),
            ("event_id", "ascending"),
        ],
    )


RANGE_LEFT = "error"
RANGE_RIGHT = "purchase"
RANGE_WINDOW_US = 3_600_000_000  # 1 hour


def q_range_join(sf_dir: str):
    """Bounded RANGE join (the second custom join Ray Data lacks): every
    ``error`` event paired with each same-user ``purchase`` in the window
    (error.ts, error.ts + 1 h]. Same composition as the as-of join —
    filter at the read, one user-bucketed shuffle, two bucket-wide merged
    rank counts (``_count_le_lex``) bounding each error's purchase window,
    pairs emitted with np.repeat — no per-user UDF call, no per-row Python
    loop over matches. Output is inner/null-free. The window bound keeps
    per-row fan-out finite, so the operator scales wherever sessionize
    does (a hash bucket of users per task).
    SQL-oracle-checked against the equivalent inequality join."""

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.is_in(
                t["event_type"],
                value_set=pa.array([RANGE_LEFT, RANGE_RIGHT], pa.string()),
            )
        )

    def merge_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        import pyarrow.compute as pc

        # rows sorted by (user_id, ts, event_id); window bounds for every
        # error across ALL users of the bucket come from two merged rank
        # counts — the (user, ts) composite keeps each span inside its
        # user's purchases, so no per-user slicing is needed
        is_l = pc.equal(tbl["event_type"], RANGE_LEFT).to_numpy(
            zero_copy_only=False
        )
        ids = tbl["event_id"].to_numpy()
        ts = tbl["ts"].cast(pa.int64()).to_numpy()
        users = tbl["user_id"].to_numpy()
        lid, lts, lu = ids[is_l], ts[is_l], users[is_l]
        rid, rts = ids[~is_l], ts[~is_l]
        ru = users[~is_l]
        if lid.size == 0 or rid.size == 0:
            lo = hi = np.empty(0, np.int64)
            lid = lts = lu = np.empty(0, np.int64)
        else:
            lo = _count_le_lex(ru, rts, lu, lts)        # strictly after lts
            hi = _count_le_lex(ru, rts, lu, lts + RANGE_WINDOW_US)
        n_hits = hi - lo
        li = np.repeat(np.arange(lid.size), n_hits)
        total = int(n_hits.sum()) if n_hits.size else 0
        # flattened per-left ranges without a Python loop:
        # arange(total) rebased to each left's lo
        base = np.repeat(np.cumsum(n_hits) - n_hits, n_hits)
        ri = (np.arange(total) - base + np.repeat(lo, n_hits)).astype(np.int64)
        return pa.table(
            {
                "error_event_id": pa.array(lid[li], pa.int64()),
                "user_id": pa.array(lu[li], pa.int64()),
                "error_ts": pa.array(lts[li], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "purchase_event_id": pa.array(rid[ri], pa.int64()),
                "purchase_ts": pa.array(rts[ri], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "lag_us": pa.array(rts[ri] - lts[li], pa.int64()),
            }
        )

    from .common import segmented_group_map, strip_schema_metadata

    return segmented_group_map(
        rd.read_parquet(
            events_path(sf_dir),
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .map_batches(strip_schema_metadata, batch_format="pyarrow")
        .map_batches(keep, batch_format="pyarrow"),
        "user_id",
        merge_bucket,
        num_partitions=shuffle_partitions(),
        sort_keys=[
            ("user_id", "ascending"),
            ("ts", "ascending"),
            ("event_id", "ascending"),
        ],
    )


QUANTILES = (0.5, 0.9, 0.99)


def q_value_quantiles(sf_dir: str):
    """EXACT distributed quantiles (p50/p90/p99) of ``value`` per
    event_type — the sketch-free variant that works whenever the value
    domain has bounded cardinality (here: 2-decimal currency-like values,
    <=50k distinct). Per-batch partials collapse to (event_type, value,
    count); the groupby(event_type) group holds one row per DISTINCT value
    — never raw events — and a vectorized cumsum picks the discrete
    quantile (smallest v with 1-based rank >= ceil(q*n), DuckDB
    quantile_disc semantics, replicated in the oracle via a window cumsum
    so the tie/interp rule is pinned). For unbounded domains this operator
    would need a t-digest/KLL sketch; the bounded-domain contract is
    asserted here by construction of the input."""

    def partial(batch: pa.Table) -> pa.Table:
        types = batch["event_type"].to_pylist()
        val = batch["value"].to_numpy()
        agg: dict[tuple, int] = {}
        for t, v in zip(types, val):
            key = (t, float(v))
            agg[key] = agg.get(key, 0) + 1
        keys = sorted(agg)
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in keys], pa.string()),
                "value": pa.array([k[1] for k in keys], pa.float64()),
                "c": pa.array([agg[k] for k in keys], pa.int64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy()
        c = group["c"].to_numpy()
        order = np.argsort(v)
        v, c = v[order], c[order]
        # collapse duplicate values arriving from different partials
        first = np.r_[True, v[1:] != v[:-1]]
        vu = v[first]
        cu = np.add.reduceat(c, np.nonzero(first)[0])
        cum = np.cumsum(cu)
        n = int(cum[-1])
        out = {
            "event_type": pa.array([group["event_type"][0].as_py()],
                                   pa.string()),
            "n_events": pa.array([n], pa.int64()),
        }
        for q in QUANTILES:
            rank = np.ceil(q * n)
            idx = int(np.searchsorted(cum, rank))
            out[f"p{int(q * 100)}"] = pa.array([float(vu[idx])], pa.float64())
        return pa.table(out)

    return (
        rd.read_parquet(events_path(sf_dir), columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finalize, batch_format="pyarrow")
    )


SLIDE_US = 900_000_000          # 15-min slide; window = WINDOW_US (1 h)
SLIDE_REPLICAS = WINDOW_US // SLIDE_US  # each event lands in exactly 4 windows


def q_sliding_window(sf_dir: str):
    """SLIDING 1-hour windows every 15 min per event_type (the hopping
    variant of ``windowed_events``' tumbling windows — the
    out-of-order-stream aggregation shape: replicate-to-window is order-
    free, so late events need no special path). Each event belongs to
    exactly ``window/slide = 4`` windows; the per-batch partial replicates
    rows with ``np.repeat``, pre-collapses per (window, type), and only the
    collapsed partials shuffle — never 4× the raw events."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        base = (ts // SLIDE_US) * SLIDE_US
        k = np.arange(SLIDE_REPLICAS, dtype=np.int64)
        win = (base[:, None] - k[None, :] * SLIDE_US).reshape(-1)
        types = np.repeat(
            np.asarray(batch["event_type"].to_pylist(), dtype=object),
            SLIDE_REPLICAS,
        )
        vals = np.repeat(batch["value"].to_numpy(), SLIDE_REPLICAS)
        t = pa.table(
            {
                "window_start": pa.array(win, pa.int64()),
                "event_type": pa.array(list(types), pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )
        g = pa.TableGroupBy(t, ["window_start", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        g = g.rename_columns(
            ["cnt" if c == "value_count" else "sv" if c == "value_sum" else c
             for c in g.column_names]
        )
        return g.replace_schema_metadata(None)

    def finalize(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "window_start": pa.array(
                    [int(group["window_start"][0].as_py())], pa.timestamp("us")
                ),
                "event_type": pa.array(
                    [group["event_type"][0].as_py()], pa.string()
                ),
                "n_events": pa.array(
                    [int(pc.sum(group["cnt"]).as_py())], pa.int64()
                ),
                "sum_value": pa.array(
                    [float(round6(pc.sum(group["sv"]).as_py()))], pa.float64()
                ),
            }
        )

    return (
        rd.read_parquet(events_path(sf_dir),
                        columns=["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .map_groups(finalize, batch_format="pyarrow")
    )


_SQL_SLIDING = f"""
WITH r AS (
  SELECT make_timestamp((epoch_us(ts) // {SLIDE_US} - t.g) * {SLIDE_US})
           AS window_start,
         event_type, value
  FROM events, range(0, {SLIDE_REPLICAS}) t(g)
)
SELECT window_start, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM r GROUP BY window_start, event_type
"""


Z_OUTLIER = 3.0


def q_event_zscore(sf_dir: str):
    """Per-event z-score against its type's population moments + an
    |z| > 3 outlier flag — the broadcast-aggregate anomaly-detection
    shape: one per-batch partial (type, n, Σv, Σv²) combine, the tiny
    per-type table (bounded by #event types, not corpus size) reduced on
    the driver and broadcast via ``ray.put``, then one streamed pass
    computes z per event. No shuffle of event rows at all."""
    import pyarrow.compute as pc
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"]
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "v": v,
                "v2": pc.multiply(v, v),
            }
        )
        g = pa.TableGroupBy(t, "event_type").aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum")]
        )
        return g.replace_schema_metadata(None)

    parts = (
        rd.read_parquet(events_path(sf_dir), columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )  # bounded: (#types × #blocks) tiny partial rows
    acc: dict[str, list[float]] = {}
    for r in parts:
        a = acc.setdefault(r["event_type"], [0.0, 0.0, 0.0])
        a[0] += r["v_count"]
        a[1] += r["v_sum"]
        a[2] += r["v2_sum"]
    moments = {
        k: (s / n, ((s2 / n) - (s / n) ** 2) ** 0.5)
        for k, (n, s, s2) in acc.items()
    }
    mom_ref = ray.put(moments)

    def zscore(batch: pa.Table) -> pa.Table:
        mom = ray.get(mom_ref)
        types = batch["event_type"].to_pylist()
        v = batch["value"].to_numpy()
        m = np.array([mom[t][0] for t in types])
        sd = np.array([mom[t][1] for t in types])
        # degenerate guard: an event_type whose values are all equal has
        # sd == 0 — define z = 0 / not-outlier (mirrored in _SQL_ZSCORE
        # via NULLIF + coalesce) instead of letting numpy emit inf/nan
        z = round6(np.divide(v - m, sd, out=np.zeros_like(v, dtype=np.float64),
                             where=sd != 0.0))
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "value": batch["value"],
                "z": pa.array(z, pa.float64()),
                "is_outlier": pa.array(np.abs(z) > Z_OUTLIER, pa.bool_()),
            }
        )

    return rd.read_parquet(
        events_path(sf_dir), columns=["event_id", "event_type", "value"]
    ).map_batches(zscore, batch_format="pyarrow")


# population stddev via the sum-of-squares identity so both sides share
# the formula (DuckDB's stddev_pop uses a different — numerically stable —
# accumulation whose last-ulp could flip a 6dp rounding boundary)
_SQL_ZSCORE = f"""
WITH s AS (
  SELECT event_type,
         avg(value) AS m,
         sqrt(sum(value * value) / count(*)
              - (sum(value) / count(*)) * (sum(value) / count(*))) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       round(coalesce((e.value - s.m) / NULLIF(s.sd, 0), 0), 6) AS z,
       (abs(round(coalesce((e.value - s.m) / NULLIF(s.sd, 0), 0), 6))
          > {Z_OUTLIER}) AS is_outlier
FROM events e JOIN s USING (event_type)
"""


QUERIES = {
    "windowed_events": q_windowed_events,
    "user_sessions": q_user_sessions,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "value_quantiles": q_value_quantiles,
    "event_zscore": q_event_zscore,
    "sliding_window": q_sliding_window,
}

ORACLE_SQL = {
    "event_zscore": _SQL_ZSCORE,
    "sliding_window": _SQL_SLIDING,
    # deterministic as-of: window-ranked left join rather than DuckDB's
    # ASOF JOIN, whose pick among equal click timestamps is unspecified —
    # the rank order (ts DESC, event_id DESC) pins the same winner the
    # engine's (ts, event_id)-sorted searchsorted picks.
    "asof_join": f"""
WITH p AS (SELECT * FROM events WHERE event_type = '{ASOF_LEFT}'),
c AS (SELECT * FROM events WHERE event_type = '{ASOF_RIGHT}'),
ranked AS (
  SELECT p.event_id, p.user_id, p.ts, p.value,
         c.event_id AS click_event_id, c.ts AS click_ts,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY c.ts DESC, c.event_id DESC
         ) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT event_id, user_id, ts, value, click_event_id, click_ts,
       date_diff('microsecond', click_ts, ts)::BIGINT AS lag_us
FROM ranked WHERE rn = 1""",
    "value_quantiles": """
WITH vc AS (
  SELECT event_type, value, count(*) AS c FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, value,
         sum(c) OVER (PARTITION BY event_type ORDER BY value) AS cr,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM vc
)
SELECT event_type, max(n)::BIGINT AS n_events,
       min(CASE WHEN cr >= ceil(0.5  * n) THEN value END) AS p50,
       min(CASE WHEN cr >= ceil(0.9  * n) THEN value END) AS p90,
       min(CASE WHEN cr >= ceil(0.99 * n) THEN value END) AS p99
FROM cum GROUP BY event_type""",
    "range_join": f"""
WITH e AS (SELECT * FROM events WHERE event_type = '{RANGE_LEFT}'),
p AS (SELECT * FROM events WHERE event_type = '{RANGE_RIGHT}')
SELECT e.event_id AS error_event_id, e.user_id, e.ts AS error_ts,
       p.event_id AS purchase_event_id, p.ts AS purchase_ts,
       date_diff('microsecond', e.ts, p.ts)::BIGINT AS lag_us
FROM e JOIN p
  ON p.user_id = e.user_id
 AND date_diff('microsecond', e.ts, p.ts) > 0
 AND date_diff('microsecond', e.ts, p.ts) <= {RANGE_WINDOW_US}""",
    "windowed_events": """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2""",
    "user_sessions": """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id, count(*) AS len FROM sess GROUP BY 1, 2
)
SELECT user_id,
       sum(len)::BIGINT AS n_events,
       count(*)::BIGINT AS n_sessions,
       max(len)::BIGINT AS max_session_events
FROM per_session GROUP BY user_id""",
}
