"""Specialized join strategies: as-of joins and skew-salted joins.

The reference has no join operators at all (SURVEY.md §2.9 — its only
"join" is the implicit tile cross-product).  These are the two join
shapes a large-scale pipeline needs beyond Catalyst's built-ins:

- :func:`asof_join` — temporal "most recent right row at or before the
  left timestamp".  The naive formulation is a range join (left x all
  earlier right rows) whose worst case is quadratic per key; this one
  is the scale-correct single-shuffle form: tag both sides, union,
  one window pass per key carrying the last non-null right payload
  forward.  Cost: one shuffle on the key + one per-key sort — same as
  any windowed aggregation, independent of join fan-out.
- :func:`salted_join` — equi-join where the LEFT side has skewed hot
  keys: left rows get a random salt in [0, n_salt), the (small-ish)
  right side is exploded n_salt times, and the join key becomes
  (key, salt), splitting each hot key across n_salt tasks.  AQE's
  skew-join handles moderate skew automatically; explicit salting is
  for the pathological case (one key = 30% of rows) where even a
  split partition's build side overflows.  Results are provably
  identical to the plain join (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    inclusive: bool = True,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the payload of the as-of right row
    with the same ``key``:

    - ``direction="backward"`` (default): the most recent right row
      with ``right_ts <= left_ts`` (strict ``<`` when
      ``inclusive=False``);
    - ``"forward"``: the earliest right row with ``right_ts >=
      left_ts`` (strict ``>`` when not inclusive);
    - ``"nearest"``: whichever of the two is closer in time
      (backward wins exact ties).

    ``tolerance`` (optional) nulls the payload when the matched row is
    farther than that from ``left_ts`` — pass a value comparable with
    ``left_ts - right_ts`` (a number for numeric timestamps, an
    INTERVAL column for real ones).

    ``payload`` maps right-column -> output-column.  Right rows must be
    unique per (key, right_ts) — pre-aggregate if not, or the result
    is nondeterministic.  Left columns pass through unchanged; rows
    with no as-of match get nulls.

    Scale shape (why this is not a join): the union + window-fill
    formulation is the distributed merge-asof — ONE shuffle on key,
    per-key cost O((L_k + R_k) log) for the sort, never the
    L_k x R_k fan-out a range join pays; ``nearest`` adds a second
    windowed fill over the same exchange, not a second shuffle."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[src].dataType).alias(dst)
          for src, dst in payload.items()],
    )
    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(src).alias(dst) for src, dst in payload.items()],
    )
    both = tagged_l.unionByName(tagged_r)
    want_b = direction in ("backward", "nearest")
    want_f = direction in ("forward", "nearest")
    fills = []
    if want_b:
        # right rows sort before left rows at equal ts when inclusive,
        # so a same-instant right row is visible to the left row
        tie = F.col("_is_left") if inclusive else -F.col("_is_left")
        wb = (
            W.partitionBy("_k")
            .orderBy(F.col("_ts"), tie)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        fills += [
            F.last(dst, ignorenulls=True).over(wb).alias(f"_b_{dst}")
            for dst in payload.values()
        ] + [
            F.last(
                F.when(F.col("_is_left") == 0, F.col("_ts")),
                ignorenulls=True,
            ).over(wb).alias("_b_ts")
        ]
    if want_f:
        # mirrored: left rows first at equal ts when inclusive, so the
        # same-instant right row falls inside the following frame
        tie = -F.col("_is_left") if inclusive else F.col("_is_left")
        wf = (
            W.partitionBy("_k")
            .orderBy(F.col("_ts"), tie)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        fills += [
            F.first(dst, ignorenulls=True).over(wf).alias(f"_fw_{dst}")
            for dst in payload.values()
        ] + [
            F.first(
                F.when(F.col("_is_left") == 0, F.col("_ts")),
                ignorenulls=True,
            ).over(wf).alias("_fw_ts")
        ]
    filled = both.select("*", *fills).where(F.col("_is_left") == 1)

    def _side(prefix: str, dist):
        ok = F.col(f"{prefix}_ts").isNotNull()
        if tolerance is not None:
            ok = ok & (dist <= tolerance)
        return ok

    if direction == "backward":
        dist = F.col("_ts") - F.col("_b_ts")
        pick = {dst: F.when(_side("_b", dist), F.col(f"_b_{dst}"))
                for dst in payload.values()}
    elif direction == "forward":
        dist = F.col("_fw_ts") - F.col("_ts")
        pick = {dst: F.when(_side("_fw", dist), F.col(f"_fw_{dst}"))
                for dst in payload.values()}
    else:
        bdist = F.col("_ts") - F.col("_b_ts")
        fdist = F.col("_fw_ts") - F.col("_ts")
        b_ok = _side("_b", bdist)
        f_ok = _side("_fw", fdist)
        use_b = b_ok & (~f_ok | (bdist <= fdist))
        pick = {
            dst: F.when(use_b, F.col(f"_b_{dst}")).otherwise(
                F.when(f_ok, F.col(f"_fw_{dst}"))
            )
            for dst in payload.values()
        }
    return filled.select(
        *lcols, *[expr.alias(dst) for dst, expr in pick.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salt: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side,
    replicate the right side ``n_salt`` ways, join on (key, salt).

    Equivalent to ``left.join(right, on, how)`` for how in
    {inner, left}; replication multiplies the right side, so keep it
    the smaller input (classic salting applies to exactly this case —
    a big skewed fact against a modest dimension that is still too big
    or too dynamic to broadcast)."""
    assert how in ("inner", "left"), "salting supports inner/left joins"
    salted_l = left.withColumn(
        "_salt", (F.rand(seed) * n_salt).cast("int")
    )
    salts = F.array(*[F.lit(s) for s in range(n_salt)])
    salted_r = right.withColumn("_salt", F.explode(salts))
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")


def last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join of the event stream against order history: for every
    event, the most recent order (by orderdate) the same customer
    placed at or before the event.  Nulls (no earlier order) surface
    as -1 so the schema stays integral.

    Scale: one shuffle on user_id for the window pass — the as-of
    never fans out, unlike a range join whose per-key cost is
    |events_k| x |orders_k|."""
    from gemmsql.datamodel import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("ok"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ots"),
            "ok",
        )
    )
    j = asof_join(
        ev,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="ots",
        payload={"ok": "last_ok", "ots": "last_ots"},
    )
    return j.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.coalesce(F.col("last_ok"), F.lit(-1)).cast("long").alias("last_orderkey"),
        F.coalesce(
            F.datediff(F.to_date("ts"), F.to_date("last_ots")), F.lit(-1)
        )
        .cast("long")
        .alias("days_since"),
    )


LAST_ORDER_BEFORE_EVENT_SQL = """
WITH r AS (
  SELECT o_custkey AS k, o_orderdate AS rts, MAX(o_orderkey) AS ok
  FROM orders GROUP BY 1, 2
),
u AS (
  SELECT user_id AS k, ts, 1 AS is_left, event_id,
         CAST(NULL AS BIGINT) AS ok, CAST(NULL AS TIMESTAMP) AS rts
  FROM events
  UNION ALL
  SELECT k, rts AS ts, 0, NULL, ok, rts FROM r
),
w AS (
  SELECT *,
    last_value(ok IGNORE NULLS) OVER win AS last_ok,
    last_value(rts IGNORE NULLS) OVER win AS last_rts
  FROM u
  WINDOW win AS (PARTITION BY k ORDER BY ts, is_left ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, CAST(k AS BIGINT) AS user_id,
       CAST(COALESCE(last_ok, -1) AS BIGINT) AS last_orderkey,
       CAST(COALESCE(date_diff('day', CAST(last_rts AS DATE), CAST(ts AS DATE)), -1) AS BIGINT) AS days_since
FROM w WHERE is_left = 1
"""


def interval_self_join(
    frame: DataFrame,
    *,
    key: str,
    id_col: str,
    start: str,
    end: str,
    hot_key_threshold: int | None = None,
    chunk: int | None = None,
) -> DataFrame:
    """All pairs of rows sharing ``key`` whose ``[start, end]``
    intervals overlap (inclusive), each pair once (``id1 < id2``).

    Scale shape: the overlap predicate alone is a range join — a
    worst-case-quadratic shuffle — but bounded here by the equi-key:
    Spark plans key-equality as the shuffle hash join and evaluates
    the interval predicate as a residual filter, so cost is
    sum_k C(n_k, 2) — per-key fan-out, never corpus-quadratic.

    ``hot_key_threshold`` turns on the SCALE.md hot-key mitigation
    (round 9 — previously prose-only): a stats probe counts rows per
    key, keys past the threshold are routed through time-chunk
    bucketing with join key ``(key, bucket)`` — the
    :func:`interval_join_keyless` trick with the real key retained —
    so one key with 10^5 live intervals generates pairs per
    (key, chunk) task instead of C(10^5, 2) on a single task, while
    cold keys keep the plain equi-key plan.  ``chunk`` (required with
    the threshold; ``start``/``end`` must be integral) should be on
    the order of the typical span.  The probe's collect is bounded by
    construction: at most N / threshold keys can exceed the
    threshold.  The pair count itself is irreducible output — the
    split caps per-TASK generation, not the answer size."""
    if hot_key_threshold is not None:
        if chunk is None:
            raise ValueError("hot_key_threshold requires chunk")
        counts = (
            frame.groupBy(key).count()
            .where(F.col("count") > hot_key_threshold)
        )
        hot = [row[0] for row in counts.collect()]
        if hot:
            cold = frame.where(~F.col(key).isin(hot))
            hotf = frame.where(F.col(key).isin(hot))
            return _equi_interval_pairs(
                cold, key=key, id_col=id_col, start=start, end=end
            ).unionByName(
                _chunked_interval_pairs(
                    hotf, key=key, id_col=id_col, start=start, end=end,
                    chunk=chunk,
                )
            )
    return _equi_interval_pairs(
        frame, key=key, id_col=id_col, start=start, end=end
    )


def _equi_interval_pairs(
    frame: DataFrame, *, key: str, id_col: str, start: str, end: str
) -> DataFrame:
    a = frame.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("id1"),
        F.col(start).alias("s1"),
        F.col(end).alias("e1"),
    )
    b = frame.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("id2"),
        F.col(start).alias("s2"),
        F.col(end).alias("e2"),
    )
    return (
        a.join(b, "_k")
        .where(
            (F.col("id1") < F.col("id2"))
            & (F.col("s1") <= F.col("e2"))
            & (F.col("s2") <= F.col("e1"))
        )
        .withColumnRenamed("_k", key)
    )


def _chunked_interval_pairs(
    frame: DataFrame, *, key: str, id_col: str, start: str, end: str,
    chunk: int,
) -> DataFrame:
    """Hot-key path: intervals explode into the ``chunk``-sized time
    buckets they touch and pair on the COMPOSITE key (key, bucket) —
    first-cell dedupe (pair kept only where the later-starting
    interval begins) exactly as in :func:`interval_join_keyless`."""
    a = frame.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("id1"),
        F.col(start).cast("long").alias("s1"),
        F.col(end).cast("long").alias("e1"),
    ).withColumn(
        "_bucket",
        F.explode(F.expr(f"sequence(s1 div {chunk}, e1 div {chunk})")),
    )
    b = a.select(
        "_k",
        F.col("id1").alias("id2"),
        F.col("s1").alias("s2"),
        F.col("e1").alias("e2"),
        "_bucket",
    )
    return (
        a.join(b, ["_k", "_bucket"])
        .where(
            (F.col("id1") < F.col("id2"))
            & (F.col("s1") <= F.col("e2"))
            & (F.col("s2") <= F.col("e1"))
            & (
                F.expr(f"greatest(s1, s2) div {chunk}")
                == F.col("_bucket")
            )
        )
        .drop("_bucket")
        .withColumnRenamed("_k", key)
    )


def interval_join_keyless(
    frame: DataFrame,
    *,
    id_col: str,
    start: str,
    end: str,
    chunk: int,
) -> DataFrame:
    """All pairs of rows whose integer ``[start, end]`` intervals
    overlap (inclusive) with NO shared equi-key — each pair once
    (``id1 < id2``) -> ``(id1, s1, e1, id2, s2, e2)``.

    The time-chunk bucketing :func:`interval_self_join` documents:
    every interval emits one row per ``chunk``-sized time bucket it
    touches (``start div chunk .. end div chunk``, an in-row sequence
    explode), and the pairing is an EQUI-join on the bucket id — so
    Catalyst plans a shuffle hash join on a synthetic key instead of a
    cartesian range join, and AQE splits any hot bucket.  A pair that
    shares several buckets would surface once per shared bucket; the
    standard first-cell dedupe keeps it only in the bucket where the
    later-starting interval begins (``greatest(s1, s2) div chunk ==
    bucket``), which costs one integer comparison instead of a
    corpus-wide DISTINCT shuffle.

    Scale shape: cost is sum_b C(n_b, 2) over bucket populations —
    bounded by interval density per chunk window, never by corpus
    size; replication factor per interval is ``1 + span/chunk``, so
    pick ``chunk`` on the order of the typical span (guidance in
    SCALE.md).  Works at any skew because a bucket is a plain join
    key: AQE skew-split applies, and there is NO cartesian anywhere
    (plan-guarded in tests/test_plans.py)."""
    sel = [
        F.col(id_col),
        F.col(start).cast("long"),
        F.col(end).cast("long"),
    ]
    a = frame.select(
        *sel,
        F.explode(
            F.expr(f"sequence({start} div {chunk}, {end} div {chunk})")
        ).alias("_bucket"),
    ).select(
        "_bucket",
        F.col(id_col).alias("id1"),
        F.col(start).alias("s1"),
        F.col(end).alias("e1"),
    )
    b = a.select(
        "_bucket",
        F.col("id1").alias("id2"),
        F.col("s1").alias("s2"),
        F.col("e1").alias("e2"),
    )
    return (
        a.join(b, "_bucket")
        .where(
            (F.col("id1") < F.col("id2"))
            & (F.col("s1") <= F.col("e2"))
            & (F.col("s2") <= F.col("e1"))
            & (
                F.expr(f"greatest(s1, s2) div {chunk}")
                == F.col("_bucket")
            )
        )
        .drop("_bucket")
    )


#: concurrency window after an error event (microseconds): two errors
#: whose windows intersect are "concurrent" — a machine-wide burst.
CE_WINDOW_US = 120_000_000
#: bucket width for the keyless chunk join — same order as the span,
#: so each interval lands in at most 2 buckets.
CE_CHUNK_US = 300_000_000


def concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Machine-wide concurrent error bursts -> ``(event_id,
    n_concurrent)`` for every error event: how many OTHER error
    events' 2-minute windows overlap this one's, across ALL users —
    the keyless interval join :func:`interval_join_keyless` gates
    (there is deliberately no equi-key; the bucket id is synthetic).

    Determinism: endpoints are exact epoch microseconds
    (``unix_micros`` / DuckDB ``epoch_us`` agree on UTC parquet
    timestamps), counts are exact integers."""
    from gemmsql.caching import scoped_cache
    from gemmsql.datamodel import load_table

    # consumed by the pair join (twice via a/b) and the zero-count
    # left join — cache, or the scan+filter runs three times
    iv = scoped_cache(
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select(
            "event_id",
            F.unix_micros("ts").alias("s"),
            (F.unix_micros("ts") + F.lit(CE_WINDOW_US)).alias("e"),
        ),
        fresh_scope=True,
    )
    pairs = interval_join_keyless(
        iv, id_col="event_id", start="s", end="e", chunk=CE_CHUNK_US
    )
    # both endpoints in ONE pass (explode, not unionAll of two selects)
    # so Catalyst derives the explode+join+filter pair plan once instead
    # of re-deriving it per union branch
    both = pairs.select(
        F.explode(F.array("id1", "id2")).alias("event_id")
    )
    counts = both.groupBy("event_id").agg(
        F.count("*").cast("long").alias("n_concurrent")
    )
    return iv.select("event_id").join(counts, "event_id", "left").select(
        "event_id",
        F.coalesce(F.col("n_concurrent"), F.lit(0))
        .cast("long")
        .alias("n_concurrent"),
    )


CONCURRENT_EVENTS_SQL = f"""
WITH iv AS (
  SELECT event_id, epoch_us(ts) AS s, epoch_us(ts) + {CE_WINDOW_US} AS e
  FROM events WHERE event_type = 'error'
),
pairs AS (
  SELECT a.event_id AS id1, b.event_id AS id2
  FROM iv a JOIN iv b
    ON a.event_id < b.event_id AND a.s <= b.e AND b.s <= a.e
),
cnt AS (
  SELECT event_id, COUNT(*) AS n FROM (
    SELECT id1 AS event_id FROM pairs
    UNION ALL SELECT id2 FROM pairs
  ) GROUP BY 1
)
SELECT iv.event_id AS event_id,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_concurrent
FROM iv LEFT JOIN cnt ON cnt.event_id = iv.event_id
"""


def concurrent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer count of overlapping order intervals ->
    ``(o_custkey, n_orders, n_overlapping)``.

    An order's interval is ``[o_orderdate, max(l_shipdate)]`` (orders
    with no lineitems drop out of the inner join).  The fulfillment
    join is on ``l_orderkey`` (co-partitioned); the overlap pairing is
    :func:`interval_self_join` keyed on the customer, so the range
    predicate never sees more than one customer's orders at once."""
    from gemmsql.datamodel import load_table

    spans = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max("l_shipdate").alias("ship_end"))
    )
    intervals = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(spans, "o_orderkey")
    )
    pairs = interval_self_join(
        intervals,
        key="o_custkey",
        id_col="o_orderkey",
        start="o_orderdate",
        end="ship_end",
    )
    n_ord = intervals.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    n_ovl = pairs.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_overlapping")
    )
    return n_ord.join(n_ovl, "o_custkey", "left").select(
        "o_custkey",
        "n_orders",
        F.coalesce(F.col("n_overlapping"), F.lit(0)).cast("long")
        .alias("n_overlapping"),
    )


CONCURRENT_ORDERS_SQL = """
WITH spans AS (
  SELECT l_orderkey AS o_orderkey, MAX(l_shipdate) AS ship_end
  FROM lineitem GROUP BY 1
),
iv AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, s.ship_end
  FROM orders o JOIN spans s USING (o_orderkey)
),
pairs AS (
  SELECT a.o_custkey
  FROM iv a JOIN iv b
    ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
   AND a.o_orderdate <= b.ship_end AND b.o_orderdate <= a.ship_end
),
n_ovl AS (SELECT o_custkey, COUNT(*) AS n_overlapping FROM pairs GROUP BY 1)
SELECT iv.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COALESCE(MAX(n_ovl.n_overlapping), 0) AS BIGINT)
         AS n_overlapping
FROM iv LEFT JOIN n_ovl ON n_ovl.o_custkey = iv.o_custkey
GROUP BY 1
"""


def event_order_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three as-of directions in one gated query (tagged
    ``which``): for every event, the customer's order nearest in time
    under a 30-day tolerance -> ``(which, event_id, orderkey,
    days_diff)``; -1 for no match within tolerance.

    Timestamps are epoch DAYS (integers) so distance arithmetic and
    the tolerance are exact on both engines.  The DuckDB twin uses
    the engine's NATIVE ``ASOF JOIN`` (backward via ``<=``, forward
    via ``>=``) — a genuinely independent as-of implementation, not a
    replay of this module's union+window formulation."""
    from gemmsql.datamodel import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("lts"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("ok"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).cast("long").alias("rts"),
            "ok",
        )
    )
    out = None
    for which in ("backward", "forward", "nearest"):
        j = asof_join(
            ev, orders,
            key="user_id", left_ts="lts", right_ts="rts",
            payload={"ok": "m_ok", "rts": "m_rts"},
            direction=which, tolerance=30,
        )
        one = j.select(
            F.lit(which).alias("which"),
            F.col("event_id").cast("long").alias("event_id"),
            F.coalesce(F.col("m_ok"), F.lit(-1)).cast("long")
            .alias("orderkey"),
            F.coalesce(
                F.abs(F.col("lts") - F.col("m_rts")), F.lit(-1)
            ).cast("long").alias("days_diff"),
        )
        out = one if out is None else out.unionByName(one)
    return out


EVENT_ORDER_ASOF_SQL = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS lts
  FROM events
),
r AS (
  SELECT o_custkey AS user_id,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS rts,
         MAX(o_orderkey) AS ok
  FROM orders GROUP BY 1, 2
),
b AS (
  SELECT e.event_id, r.ok, e.lts - r.rts AS dist
  FROM e ASOF LEFT JOIN r
    ON e.user_id = r.user_id AND r.rts <= e.lts
),
f AS (
  SELECT e.event_id, r.ok, r.rts - e.lts AS dist
  FROM e ASOF LEFT JOIN r
    ON e.user_id = r.user_id AND r.rts >= e.lts
),
legs AS (
  SELECT 'backward' AS which, event_id,
         CASE WHEN dist <= 30 THEN ok END AS ok,
         CASE WHEN dist <= 30 THEN dist END AS dist
  FROM b
  UNION ALL
  SELECT 'forward', event_id,
         CASE WHEN dist <= 30 THEN ok END,
         CASE WHEN dist <= 30 THEN dist END
  FROM f
  UNION ALL
  SELECT 'nearest', b.event_id,
         CASE WHEN b.dist <= 30
                   AND (f.dist IS NULL OR f.dist > 30
                        OR b.dist <= f.dist) THEN b.ok
              WHEN f.dist <= 30 THEN f.ok END,
         CASE WHEN b.dist <= 30
                   AND (f.dist IS NULL OR f.dist > 30
                        OR b.dist <= f.dist) THEN b.dist
              WHEN f.dist <= 30 THEN f.dist END
  FROM b JOIN f USING (event_id)
)
SELECT which, CAST(event_id AS BIGINT) AS event_id,
       CAST(COALESCE(ok, -1) AS BIGINT) AS orderkey,
       CAST(COALESCE(dist, -1) AS BIGINT) AS days_diff
FROM legs
"""
