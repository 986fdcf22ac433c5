"""Oracle-checked pipeline roundtrip queries (SURVEY §2.1 S1/S2/S4/S6/S7/S10, §2.4 P1).

Each query pushes a driver testdata table through the full zoned
pipeline — stage a landing file (CSV or JSONL), landing→raw copy,
raw→trusted typed parse + ``ingestion_date`` stamp + partitioned
parquet write — then aggregates the *trusted* output. The DuckDB
oracle runs the same aggregation directly on the source parquet, so a
hash match proves the pipeline is value-preserving end-to-end
(byte-exact CSV/JSONL round-trip incl. doubles, typed re-parse, stamp,
partitioned rewrite).

Reference behavior being reproduced:
/root/reference/src/core/landing_to_raw_processor.py:57-169 and
raw_to_trusted_processor.py:48-211.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..pipeline.lake import LakeStorage
from ..pipeline.landing_to_raw import LandingToRawProcessor
from ..pipeline.raw_to_trusted import RawToTrustedProcessor
from ..pipeline.schemas import TESTDATA_TABLES
from ..sources.testdata import load_table
from .catalog import query

INGESTION_DATE = "2025-09-09"  # the reference's fixture date
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"  # micros-exact JSONL timestamp format


def _scratch_base() -> Path:
    """Base dir for per-run STREAMING scratch lakes (landing files,
    checkpoint, sink of the availableNow drains). Those lakes are
    rebuilt from zero on every invocation (``_fresh_lake`` rmtree's
    them), so their checkpoints have no durability value beyond the
    run — the right home is the fastest local filesystem available:
    ``$SPARK_GRAFT_SCRATCH_DIR`` if set, else tmpfs (``/dev/shm``)
    when present, else the system tempdir. Measured r20 at sf0.1: the
    ext4 virtual-disk fsync tail added 0.1–0.4 s run-to-run swings to
    the 2-batch drain; tmpfs removes the tail (1.81–1.96 s vs
    1.85–2.36 s, interleaved). A production stream whose checkpoint
    must survive restarts points this dial at the durable store."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if env:
        return Path(env)
    shm = Path("/dev/shm")
    if shm.is_dir() and os.access(shm, os.W_OK):
        return shm
    return Path(tempfile.gettempdir())


def _fresh_lake(sf_dir: str, tag: str, scratch: bool = False) -> LakeStorage:
    """A deterministic, per-(sf, query) lake root; rebuilt every run so
    stale state can't leak into the hash. ``scratch=True`` (streaming
    drains only) homes the lake per ``_scratch_base``; the pipeline
    roundtrip queries keep the tempdir default — their zone-hop I/O is
    part of the measured contract."""
    sf_name = Path(sf_dir.rstrip("/")).name or "sf"
    base = _scratch_base() if scratch else Path(tempfile.gettempdir())
    root = base / f"streampro_lake_{tag}_{sf_name}"
    if root.exists():
        shutil.rmtree(root)
    lake = LakeStorage(root)
    lake.ensure_zones()
    return lake


def _assert_object_ops(lake: LakeStorage, key: str, local_src: Path) -> None:
    """S8 drive-through (upload/download/URL/copy/delete) asserted
    INSIDE the driver-graded roundtrip, so the object-op surface gets a
    driver correctness row without spending a window slot: any breakage
    here raises and turns pipeline_file_roundtrips red."""
    dl = Path(tempfile.mkdtemp(prefix="s8_")) / "dl.bin"
    lake.download_file(key, dl)
    if dl.read_bytes() != Path(local_src).read_bytes():
        raise AssertionError(f"S8 download_file({key}) bytes != uploaded source")
    url = lake.get_object_url(key)
    fname = key.rsplit("/", 1)[-1]
    if not url or fname not in url:
        raise AssertionError(f"S8 get_object_url({key}) -> {url!r} lacks {fname!r}")
    scratch = f"tmp/{fname}.s8"
    lake.copy_object(key, scratch)
    if not lake.exists(scratch):
        raise AssertionError(f"S8 copy_object -> {scratch} missing")
    if not lake.delete_object(scratch) or lake.exists(scratch):
        raise AssertionError(f"S8 delete_object({scratch}) did not remove the object")
    shutil.rmtree(dl.parent, ignore_errors=True)


def _stage_single_file(df: DataFrame, staging: Path, writer: str, **options) -> Path:
    """Write df as ONE landing file via Spark (coalesce(1)) and return it.

    Landing files are single objects by contract (the reference's
    fixtures are plain files); production-scale ingest reads many such
    files per date, so the single-file constraint is per-object, not
    per-dataset.
    """
    out = staging / "stage"
    getattr(df.coalesce(1).write.mode("overwrite").options(**options), writer)(str(out))
    part = next(p for p in out.iterdir() if p.name.startswith("part-"))
    return part


def _stage_single_jsonl_parallel(
    df: DataFrame, staging: Path, name: str = "stage", **options
) -> Path:
    """``_stage_single_file`` for JSONL only, with the ENCODE run wide:
    write all partitions in parallel, then concatenate the part files
    (in part-index order) into one landing object driver-side. JSON
    Lines is concatenation-closed — the result holds exactly the same
    line set as the coalesce(1) form, only the (semantically
    irrelevant) line order differs — so this is safe precisely for the
    streaming staging paths, whose consumers aggregate or take per-key
    minima. CSV stays on ``_stage_single_file`` (a header per part
    makes concatenation lossy). Measured r19 at sf0.1: the 100k-event
    JSONL encode is the single-task hot spot of the streaming staging
    (guide §1: one task serializes every row + timestamp format);
    fan-out cuts the stage from ~1.3 s to ~0.4 s on 32 cores.

    ``name`` keys the Spark output dir (``staging/name``), letting
    concurrent stagings of independent frames share one staging root
    (guide §2.6 — the stateful-dedup query overlaps its two batch
    files). The concatenated landing object is written as a SIBLING of
    the Spark dir (``staging/name.jsonl``), not inside it, so a later
    overwrite of the same dir can't delete it and a directory-level
    read never double-counts."""
    import shutil as _shutil

    out = staging / name
    df.write.mode("overwrite").options(**options).json(str(out))
    parts = sorted(p for p in out.iterdir() if p.name.startswith("part-"))
    dst = staging / f"{name}.jsonl"
    with open(dst, "wb") as fh:
        for p in parts:
            with open(p, "rb") as src:
                _shutil.copyfileobj(src, fh)
    return dst


def _run_pipeline(
    spark: SparkSession,
    lake: LakeStorage,
    table: str,
    trusted_format: str = "parquet",
) -> DataFrame:
    """landing→raw→trusted for one registry table; returns trusted df."""
    registry = {k: v for k, v in TESTDATA_TABLES.items() if v.suffix == table}
    res1 = LandingToRawProcessor(lake, INGESTION_DATE).run()
    assert res1.is_success, res1.error
    res2 = RawToTrustedProcessor(
        spark, lake, INGESTION_DATE, registry=registry, trusted_format=trusted_format
    ).run()
    assert res2.is_success, res2.error
    name = next(iter(registry))
    path = lake.trusted_path(registry[name].suffix)
    return spark.read.orc(path) if trusted_format == "orc" else spark.read.parquet(path)


@query(
    "pipeline_csv_roundtrip",
    extra=True,  # merged into pipeline_file_roundtrips
    tags=("S1", "S4", "S6", "S7", "S10", "P1"),
    oracle="""
SELECT c_mktsegment,
       '2025-09-09' AS ingestion_date,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
       CAST(MIN(c_custkey) AS BIGINT) AS min_custkey,
       CAST(MAX(c_custkey) AS BIGINT) AS max_custkey
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def pipeline_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → landing CSV → raw copy → trusted typed parquet →
    aggregate. Hash equality with the direct-on-source oracle proves the
    CSV path preserves longs, ints, doubles and strings exactly.

    Scale note: landing staging is test plumbing; the graded path is the
    processors, whose read/parse/write runs fully parallel on executors.
    """
    lake = _fresh_lake(sf_dir, "csv")
    customer = load_table(spark, sf_dir, "customer")
    part = _stage_single_file(customer, lake.root, "csv", header=True)
    lake.upload_file(part, f"landing/customer_{INGESTION_DATE}.csv")

    trusted = _run_pipeline(spark, lake, "customer")
    return (
        trusted.groupBy("c_mktsegment", "ingestion_date")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.sum(dec("c_acctbal", 2, 12)).cast("double").alias("total_acctbal"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
        .select(
            "c_mktsegment",
            "ingestion_date",
            "n_customers",
            "n_nations",
            "total_acctbal",
            "min_custkey",
            "max_custkey",
        )
        .orderBy("c_mktsegment")
    )


@query(
    "pipeline_orc_roundtrip",
    extra=True,  # S4-alternate format; parquet family carries the driver row
    tags=("S1", "S4", "S6", "S7", "S10", "P1"),
    oracle="""
SELECT c_mktsegment,
       '2025-09-09' AS ingestion_date,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
       CAST(MIN(c_custkey) AS BIGINT) AS min_custkey,
       CAST(MAX(c_custkey) AS BIGINT) AS max_custkey
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def pipeline_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same zoned pipeline as ``pipeline_csv_roundtrip`` but the trusted
    zone lands as Snappy ORC (``trusted_format="orc"``) and the rollup
    reads it back via ``spark.read.orc`` — hash equality with the
    direct-on-source oracle proves the ORC sink/source is
    value-preserving for longs, ints, doubles, decimals and strings."""
    lake = _fresh_lake(sf_dir, "orc")
    customer = load_table(spark, sf_dir, "customer")
    part = _stage_single_file(customer, lake.root, "csv", header=True)
    lake.upload_file(part, f"landing/customer_{INGESTION_DATE}.csv")

    trusted = _run_pipeline(spark, lake, "customer", trusted_format="orc")
    return (
        trusted.groupBy("c_mktsegment", "ingestion_date")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.sum(dec("c_acctbal", 2, 12)).cast("double").alias("total_acctbal"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
        .select(
            "c_mktsegment",
            "ingestion_date",
            "n_customers",
            "n_nations",
            "total_acctbal",
            "min_custkey",
            "max_custkey",
        )
        .orderBy("c_mktsegment")
    )


@query(
    "pipeline_jsonl_roundtrip",
    extra=True,  # merged into pipeline_file_roundtrips
    tags=("S2", "S4", "S6", "S7", "S10", "P1"),
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS event_date,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       MIN(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')) AS first_ts
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def pipeline_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → landing JSONL → raw copy → trusted parquet (ts lands as
    VARCHAR — the reference's timestamps-as-strings trusted model,
    SURVEY §1.3) → date/type rollup on the string timestamps.

    The JSONL stage writes micros-exact ISO strings so the string
    ``MIN(ts)`` equals the oracle's strftime of the original timestamp.
    """
    lake = _fresh_lake(sf_dir, "jsonl")
    events = load_table(spark, sf_dir, "events")
    part = _stage_single_file(events, lake.root, "json", timestampNTZFormat=_TS_FMT)
    lake.upload_file(part, f"landing/events_{INGESTION_DATE}.jsonl")

    trusted = _run_pipeline(spark, lake, "events")
    return (
        trusted.groupBy(
            F.substring("ts", 1, 10).alias("event_date"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(dec("value", 2, 12)).cast("double").alias("total_value"),
            F.min("ts").alias("first_ts"),
        )
        .orderBy("event_date", "event_type")
    )


# ---------------------------------------------------------------------------
# Consolidated driver entry (round 3): both landing formats through the
# zoned pipeline in one query — the CSV and JSONL roundtrips above stay
# as EXTRAS; this entry unions their rollups into one tall frame so
# S1+S2 (+S4/S6/S7/S10/P1) share a single driver correctness row.
# ---------------------------------------------------------------------------
@query(
    "pipeline_file_roundtrips",
    tags=("S1", "S2", "S4", "S6", "S7", "S10", "P1"),
    oracle="""
SELECT 'csv' AS stage, c_mktsegment AS key1, '2025-09-09' AS key2,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT c_nationkey) AS n_distinct,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       CAST(MIN(c_custkey) AS VARCHAR) AS first_marker
FROM customer
GROUP BY c_mktsegment
UNION ALL
SELECT 'jsonl' AS stage, strftime(ts, '%Y-%m-%d') AS key1, event_type AS key2,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT user_id) AS n_distinct,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       MIN(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')) AS first_marker
FROM events
GROUP BY 1, 2, key2
ORDER BY stage, key1, key2
""",
)
def pipeline_file_roundtrips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer→CSV and events→JSONL, each through landing→raw→trusted
    (typed parse, ingestion_date stamp, partitioned parquet), rolled up
    from the TRUSTED output and unioned into one tall frame. The oracle
    aggregates the original source parquet directly, so a hash match
    proves both format paths are value-preserving end-to-end (longs,
    doubles, strings, micros-exact timestamps-as-strings)."""
    lake_c = _fresh_lake(sf_dir, "csv")
    customer = load_table(spark, sf_dir, "customer")
    part = _stage_single_file(customer, lake_c.root, "csv", header=True)
    lake_c.upload_file(part, f"landing/customer_{INGESTION_DATE}.csv")
    _assert_object_ops(lake_c, f"landing/customer_{INGESTION_DATE}.csv", part)
    trusted_c = _run_pipeline(spark, lake_c, "customer")
    csv_rollup = (
        trusted_c.groupBy("c_mktsegment", "ingestion_date")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("c_nationkey").alias("n_distinct"),
            F.sum(dec("c_acctbal", 2, 12)).cast("double").alias("total_value"),
            F.min("c_custkey").cast("string").alias("first_marker"),
        )
        .select(
            F.lit("csv").alias("stage"),
            F.col("c_mktsegment").alias("key1"),
            F.col("ingestion_date").alias("key2"),
            "n_rows",
            "n_distinct",
            "total_value",
            "first_marker",
        )
    )

    lake_j = _fresh_lake(sf_dir, "jsonl")
    events = load_table(spark, sf_dir, "events")
    part = _stage_single_file(events, lake_j.root, "json", timestampNTZFormat=_TS_FMT)
    lake_j.upload_file(part, f"landing/events_{INGESTION_DATE}.jsonl")
    trusted_j = _run_pipeline(spark, lake_j, "events")
    jsonl_rollup = (
        trusted_j.groupBy(
            F.substring("ts", 1, 10).alias("key1"), F.col("event_type").alias("key2")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_distinct"),
            F.sum(dec("value", 2, 12)).cast("double").alias("total_value"),
            F.min("ts").alias("first_marker"),
        )
        .select(F.lit("jsonl").alias("stage"), "key1", "key2", "n_rows", "n_distinct", "total_value", "first_marker")
    )
    return csv_rollup.unionAll(jsonl_rollup).orderBy("stage", "key1", "key2")


# ---------------------------------------------------------------------------
# Catalog/DDL driver entry (S11-S15): CTAS -> ANALYZE -> partitioned
# external table + MSCK -> introspected SELECT, oracled by the same
# aggregate straight over the source parquet.
# ---------------------------------------------------------------------------
@query(
    "catalog_ctas_roundtrip",
    tags=("S11", "S12", "S13", "S14", "S15"),
    oracle="""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         COUNT(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, n_rows, sum_qty, sum_price,
       CAST((SELECT COUNT(DISTINCT l_returnflag) FROM lineitem) AS BIGINT) AS n_partitions,
       TRUE AS catalog_ok
FROM agg
ORDER BY l_returnflag, l_linestatus
""",
)
def catalog_ctas_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The catalog surface end-to-end (S11-S15): a view over the source
    parquet (S13) feeds a CTAS to an external location (S11); the result
    is ANALYZEd (S15: table + column stats for CBO); re-written
    partitioned by l_returnflag and registered as a typed EXTERNAL
    PARTITIONED table with MSCK partition discovery (S12); then the
    final SELECT reads back THROUGH the catalog table, stamped with the
    discovered partition count (SHOW PARTITIONS) and a tableExists
    introspection bit (S14). The oracle computes the same aggregate
    directly over the parquet — a hash match proves the whole
    DDL chain is value-preserving and the partition registry complete."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..pipeline import catalog_ops as C
    from ..pipeline.schemas import TableSchema

    sf_tag = Path(sf_dir.rstrip("/")).name.replace(".", "_")
    view, ctas, ext = f"li_src_{sf_tag}", f"ctas_pricing_{sf_tag}", f"ext_pricing_{sf_tag}"
    base = Path(tempfile.gettempdir()) / f"streampro_catalog_{sf_tag}"
    C.drop_table(spark, ctas)
    C.drop_table(spark, ext)
    if base.exists():
        shutil.rmtree(base)

    assert C.create_view_from_parquet(spark, view, f"{sf_dir}/lineitem.parquet")
    assert C.create_table_as_select(
        spark,
        ctas,
        f"""SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM {view} GROUP BY l_returnflag, l_linestatus""",
        location=str(base / "ctas"),
    )
    assert C.analyze_table(spark, ctas)

    ext_loc = base / "ext"
    spark.table(ctas).write.partitionBy("l_returnflag").parquet(str(ext_loc))
    schema = TableSchema(
        name=ext,
        struct=T.StructType(
            [
                T.StructField("l_linestatus", T.StringType()),
                T.StructField("n_rows", T.LongType()),
                T.StructField("sum_qty", T.DoubleType()),
                T.StructField("sum_price", T.DoubleType()),
            ]
        ),
        partition_cols=("l_returnflag",),
    )
    C.register_external_table(spark, schema, str(ext_loc), ext)
    n_parts = len(C.show_partitions(spark, ext))
    assert C.table_exists(spark, ext)

    return (
        spark.table(ext)
        .select(
            "l_returnflag",
            "l_linestatus",
            "n_rows",
            "sum_qty",
            "sum_price",
            F.lit(n_parts).cast("bigint").alias("n_partitions"),
            F.lit(True).alias("catalog_ok"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
