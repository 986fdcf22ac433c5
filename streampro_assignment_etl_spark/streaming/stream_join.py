"""Stream-stream interval join: watermarked join of two live event
streams (VERDICT r12 Next #3 — the one major Structured Streaming
surface the repo lacked; the streaming counterpart of the batch as-of
family in ``operators/asof.py`` and of the driver-checked
``asof_last_view_before_click``).

Semantics and scale shape:

* **Both sides are streams**, so neither can be fully materialized:
  Spark buffers each side's recent rows in the state store and joins
  new arrivals against the other side's buffered state. Without
  bounds that state grows forever — the classic stream-join failure.
* **Watermark + time-range condition = bounded state.** The join
  condition constrains ``right.ts`` to ``[left.ts − horizon,
  left.ts]``; with a watermark on BOTH sides Spark derives exactly how
  long each input row can still find a partner and EVICTS it after
  ``watermark + horizon`` of event time — state is O(input rate ×
  horizon), independent of stream lifetime (pinned in tests via
  ``stateOperators.numRowsTotal``).
* **Late data** behind the watermark is dropped before it can join —
  the deliberate completeness/liveness trade every watermarked op
  makes; the test pins an in-horizon but behind-watermark row
  producing no pair.
* **Batch is the oracle**: ``withWatermark`` is a no-op in batch
  queries, so the SAME builder runs on static frames as a plain
  interval (theta-range) join — the pytest family pins the streamed
  result bit-equal to the batch run over identical inputs, and the
  EXTRAS query (``queries/extensions.py``) hash-gates the batch form
  against DuckDB.
* **At 100 TB**: the join shuffles both streams on the key — the
  same hash partitioning a batch join would use, but paid
  incrementally per micro-batch. A skewed key (one bot user clicking
  everything) concentrates state in one partition exactly like a
  skewed batch join. The shipped levers (VERDICT r13 #6):
  ``hot_key_stats`` measures each key's per-window state
  contribution, ``cap_hot_keys`` drops or deterministically thins
  flagged keys BEFORE the join (stateless filter — replay-stable, no
  extra shuffle), and ``hot_key_cap_audit`` reports exactly what the
  cap shed (the ``overcap_band_stats`` discipline: a cap without an
  audit is a silent recall hole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` to rows of ``left`` sharing ``key_col``
    with ``right_ts ∈ [left_ts − horizon, left_ts]`` (the attribution
    direction: right events that could have CAUSED the left event).
    ``left_ts``/``right_ts`` must be distinct column names (the output
    carries both); every other column name must be unique across the
    two frames apart from ``key_col``.

    Works identically on streaming and batch inputs: on streams the
    watermarks bound join state (see module docstring); on batch
    frames ``withWatermark`` is a no-op and Catalyst plans an ordinary
    range join — which is precisely what makes the batch form the
    oracle for the streamed one."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {horizon}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    joined = lw.join(rw, cond, join_type)
    # one unambiguous key column in the output
    return joined.select(
        F.col(f"l.{key_col}").alias(key_col),
        *[F.col(f"l.{c}") for c in left.columns if c != key_col],
        *[F.col(f"r.{c}") for c in right.columns if c != key_col],
    )


def hot_key_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window: str = "1 hour",
    state_threshold: int | None = None,
) -> DataFrame:
    """Per-(event-time window, key) row counts — the hot-key AUDIT for
    the stream-stream join. A key's rows inside the horizon are
    exactly what the join buffers for it, so this windowed pre-count
    IS its state contribution; the key whose count dwarfs the rest is
    the bot user concentrating one partition's state. Run it on the
    batch face (yesterday's events) as the monitoring query, or on a
    watermarked stream as a side aggregation. ``state_threshold`` adds
    an ``over_threshold`` flag so a cron can lift the flagged keys
    straight into ``cap_hot_keys``. One windowed aggregation —
    map-side combined, output rows = windows × active keys."""
    out = (
        df.groupBy(F.window(ts_col, window).alias("_win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.date_format(F.col("_win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            key_col,
            "n_rows",
        )
    )
    if state_threshold is not None:
        out = out.withColumn(
            "over_threshold", F.col("n_rows") >= F.lit(int(state_threshold))
        )
    return out


def cap_hot_keys(
    df: DataFrame,
    key_col: str,
    hot_keys,
    keep_1_in: int | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """The cap/filter hook the module docstring's skew caveat points
    at: apply BEFORE the stream-stream join to keys ``hot_key_stats``
    flagged. ``keep_1_in=None`` DROPS the flagged keys' rows outright
    (the bot-traffic answer); ``keep_1_in=k`` keeps a deterministic
    1-in-k THINNING of them — rows where ``xxhash64(id_col) % k == 0``
    — which preserves a sample of the key's behavior while bounding
    its state at rate/k. Determinism is the load-bearing property: a
    replayed micro-batch keeps/drops the SAME rows (a random sample
    would break exactly-once replay), and both sides of a join capped
    with the same parameters stay consistent.

    Stateless literal filter: streaming-safe, no extra shuffle, no
    state. ``hot_keys`` is audit-output-sized by contract (a handful
    of abusive keys, not a population). ALWAYS pair with
    ``hot_key_cap_audit`` — a silent cap is an unaccounted recall
    hole, the same rule as the LSH bucket cap
    (``minhash.overcap_band_stats``)."""
    hot = list(hot_keys)
    if not hot:
        return df
    is_hot = F.col(key_col).isin(hot)
    if keep_1_in is None:
        return df.filter(~is_hot)
    if id_col is None:
        raise ValueError("cap_hot_keys: keep_1_in thinning requires id_col")
    kept = F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(keep_1_in))) == 0
    return df.filter(~is_hot | kept)


def hot_key_cap_audit(
    df: DataFrame,
    key_col: str,
    hot_keys,
    keep_1_in: int | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """One row per flagged key: (key, rows_seen, rows_kept,
    rows_dropped) under exactly the ``cap_hot_keys`` parameters — the
    audit that says what the cap actually shed on this data. Run it on
    the batch face or per micro-batch inside a ``foreachBatch`` body
    (one aggregate over the flagged keys' rows only)."""
    hot = list(hot_keys)
    is_hot = F.col(key_col).isin(hot) if hot else F.lit(False)
    if keep_1_in is None:
        kept = F.lit(False)
    else:
        if id_col is None:
            raise ValueError(
                "hot_key_cap_audit: keep_1_in thinning requires id_col"
            )
        kept = F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(keep_1_in))) == 0
    return (
        df.filter(is_hot)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("rows_kept"),
        )
        .withColumn("rows_dropped", F.col("rows_seen") - F.col("rows_kept"))
        .orderBy(key_col)
    )


def view_click_attribution(
    clicks: DataFrame,
    views: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """View→click attribution within a horizon: every (click, view)
    pair of the same user where the view happened in the ``horizon``
    before (or at) the click — the streaming counterpart of
    ``asof_last_view_before_click`` widened from "last view" to "all
    attributable views" (a stream-stream join emits pairs as they
    become provable; the per-click argmax is a second stateful
    aggregation batch analytics does better downstream).

    Inputs are event frames shaped like ``events_stream``'s
    (``event_id``, ``user_id``, ``ts_event``, ``value``); both may be
    live streams. Output: (user_id, click_id, click_ts, view_id,
    view_ts, view_value), one row per attributable pair."""
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_event").alias("click_ts"),
    )
    v = views.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts_event").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return stream_interval_join(
        c, v, "user_id", "click_ts", "view_ts",
        horizon=horizon, watermark=watermark, join_type=join_type,
    )


def last_view_before_click_stream(
    clicks: DataFrame,
    views: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """The STREAMING as-of join: for every click, the single most
    recent at-or-before view within the horizon — the live counterpart
    of the driver-checked ``asof_last_view_before_click``
    (``operators/asof.py`` union+window form is the batch oracle,
    restricted to matches inside the horizon). A pure stream-stream
    join can only emit ALL attributable pairs; picking the LAST one is
    an argmax that must wait until no later view can still arrive — so
    this chains the interval join with a second stateful aggregation:

    * group by (event-time window of click_ts, click_id) — the window
      column is what lets the aggregation state EVICT (a bare
      ``groupBy(click_id)`` would be an unbounded-key streaming agg:
      every click ever seen held forever, the 100 TB failure mode);
    * ``max(struct(view_ts, view_id, view_value))`` — struct max is
      lexicographic, so the latest view_ts wins with deterministic
      view_id tie-break, exactly the as-of tie rule;
    * each click's answer emits once the watermark closes its window —
      correct-by-construction at the price of window latency, the same
      completeness/liveness trade every append-mode aggregation makes.

    Output: (click_id, user_id, click_ts, last_view_ts, last_view_id,
    last_view_value), one row per matched click. Unmatched clicks are
    absent (inner form) — compose with the leftOuter join where the
    null rows matter."""
    pairs = view_click_attribution(
        clicks, views, horizon=horizon, watermark=watermark
    )
    return (
        pairs.groupBy(
            F.window("click_ts", window).alias("_win"),
            F.col("click_id"),
            F.col("user_id"),
        )
        .agg(
            # click_ts is functionally determined by click_id but can't
            # be a grouping key — the window already claims the one
            # event-time column a streaming agg may carry — so recover
            # it as an aggregate (max == the single value)
            F.max("click_ts").alias("click_ts"),
            F.max(F.struct("view_ts", "view_id", "view_value")).alias("_last"),
        )
        .select(
            "click_id",
            "user_id",
            "click_ts",
            F.col("_last.view_ts").alias("last_view_ts"),
            F.col("_last.view_id").alias("last_view_id"),
            F.col("_last.view_value").alias("last_view_value"),
        )
    )


def attributed_view_counts(
    clicks: DataFrame,
    views: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
    window: str = "1 hour",
    exact_clicks: bool = False,
) -> DataFrame:
    """CHAINED stateful operators: the stream-stream interval join
    followed by a windowed streaming aggregation in one query — per
    (click-time window, user), how many views were attributed. Two
    state stores run in sequence: the join buffers both inputs within
    the horizon, and the aggregation holds open windows; Spark
    propagates the watermark THROUGH the join (the join's output
    event-time column ``click_ts`` carries it), so each window closes
    and emits once no click that could land in it can still arrive —
    the multi-stateful-operator pipeline Spark supports natively since
    3.5 (spark.sql.streaming.statefulOperator.allowMultiple). In batch
    the identical builder is a plain join + GROUP BY, which is the
    oracle: the streamed run over the same input equals it on every
    CLOSED window (pinned; still-open windows are the append-mode
    liveness trade, not a loss).

    ``exact_clicks=True`` swaps the click-count column to an exact
    COUNT(DISTINCT) — BATCH ONLY (streaming aggregation does not
    support exact distincts); it exists so the batch face can be
    hash-gated against DuckDB, where approx_count_distinct's HLL++
    sketch has no cross-engine replay."""
    pairs = view_click_attribution(
        clicks, views, horizon=horizon, watermark=watermark
    )
    clicks_agg = (
        F.countDistinct("click_id") if exact_clicks
        else F.approx_count_distinct("click_id")
    )
    return (
        pairs.groupBy(
            F.window("click_ts", window).alias("win"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_attributed_views"),
            clicks_agg.alias("n_clicks"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "user_id",
            "n_attributed_views",
            "n_clicks",
        )
    )
