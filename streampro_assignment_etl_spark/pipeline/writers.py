"""Zone writers (SURVEY §2.1 S4/S5): parquet + CSV DataFrame sinks.

The reference's ``MinIOClient.upload_dataframe`` (minio_client.py:47-70)
buffers a whole pandas frame and PUTs one object per table; here the
writers are Spark-native — executors write partition files in parallel
straight to the zone path, and partitioned targets use dynamic
partition overwrite so re-running one ingestion date replaces exactly
that partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """S4 — Snappy parquet (Spark's default codec), optionally
    Hive-partitioned."""
    writer = df.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """S5 — header-bearing CSV export.

    ``single_file=True`` coalesces to one part file (the reference's
    one-object-per-table layout) — only for dimension-sized outputs; at
    scale leave it False and let executors write in parallel.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)
