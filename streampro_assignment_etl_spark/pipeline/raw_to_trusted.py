"""Raw → trusted processor (SURVEY §2.1 S1/S2/S4, §2.4 P1, §3.3).

Behavioral parity with
/root/reference/src/core/raw_to_trusted_processor.py:48-211 — for each
registry table, read ``raw/ingestion_date=<d>/<table>_<d>.{csv,jsonl}``,
stamp ``ingestion_date``, write Snappy parquet under
``trusted/<table>/ingestion_date=<d>/`` — re-expressed Spark-first:

* reads use ``spark.read.schema(...)`` from the typed registry (the
  reference lets pandas infer dtypes; SURVEY §1.2 calls that drift out)
  so executors parse CSV/JSONL in parallel, one partition per split —
  this is the step that actually scales to 100 TB;
* the ingestion_date stamp is ``withColumn(..., lit(d))`` (P1);
* the write is ``partitionBy("ingestion_date")`` with dynamic partition
  overwrite, so re-running one date replaces exactly that partition and
  never touches neighbors (the reference overwrites a single
  ``data.parquet`` object — same idempotency contract, but ours keeps
  parallel output files);
* corrupt rows fail loudly (``mode=FAILFAST``) instead of pandas'
  silent coercion — trusted data is typed or the job fails.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import BaseProcessor, ProcessingResult
from .lake import LakeStorage
from .schemas import STREAMPRO_TABLES, TableSchema
from .writers import write_parquet

log = logging.getLogger("streampro.pipeline.raw_to_trusted")


class RawToTrustedProcessor(BaseProcessor):
    def __init__(
        self,
        spark: SparkSession,
        lake: LakeStorage,
        ingestion_date: str,
        registry: dict[str, TableSchema] | None = None,
    ):
        super().__init__(
            "raw_to_trusted_processor",
            "Parse raw CSV/JSONL into typed, partitioned trusted parquet",
        )
        self.spark = spark
        self.lake = lake
        self.ingestion_date = ingestion_date
        self.registry = registry or STREAMPRO_TABLES

    # -- extract ---------------------------------------------------------
    def read_csv(self, path: str, schema: TableSchema) -> DataFrame:
        """S1 — typed, header-aware CSV read
        (≙ MinIOClient.read_csv, minio_client.py:96-104)."""
        return (
            self.spark.read.schema(schema.struct)
            .option("header", True)
            .option("mode", "FAILFAST")
            .csv(path)
        )

    def read_jsonl(self, path: str, schema: TableSchema) -> DataFrame:
        """S2 — typed JSONL read; Spark's JSON source is line-delimited by
        default (≙ extract_jsonl, raw_to_trusted_processor.py:60-79)."""
        return (
            self.spark.read.schema(schema.struct)
            .option("mode", "FAILFAST")
            .json(path)
        )

    def _extract(self) -> dict[str, DataFrame]:
        out: dict[str, DataFrame] = {}
        for name, schema in self.registry.items():
            table_key = schema.suffix
            path = self.lake.raw_file_path(self.ingestion_date, table_key, schema.fmt)
            if not self.lake.exists(
                self.lake.raw_partition_key(
                    self.ingestion_date,
                    f"{table_key}_{self.ingestion_date}.{'jsonl' if schema.fmt == 'jsonl' else 'csv'}",
                )
            ):
                log.warning("raw file missing for %s (%s) — skipping", table_key, path)
                continue
            reader = self.read_jsonl if schema.fmt == "jsonl" else self.read_csv
            out[name] = reader(path, schema)
        log.info("extracted %d raw datasets", len(out))
        return out

    # -- transform -------------------------------------------------------
    def _transform(self, extracted: dict[str, DataFrame]) -> dict[str, DataFrame]:
        # P1: stamp the partition column if the file didn't carry one
        # (raw_to_trusted_processor.py:131-132).
        return {
            name: (
                df
                if "ingestion_date" in df.columns
                else df.withColumn("ingestion_date", F.lit(self.ingestion_date))
            )
            for name, df in extracted.items()
        }

    # -- load --------------------------------------------------------------
    def _load(self, transformed: dict[str, DataFrame]) -> ProcessingResult:
        created, failed = [], []
        for name, df in transformed.items():
            schema = self.registry[name]
            target = self.lake.trusted_path(schema.suffix)
            try:
                write_parquet(df, target, schema.partition_cols)
                created.append(name)
            except Exception as exc:  # noqa: BLE001 — per-table isolation, like the reference
                failed.append({"table": name, "error": str(exc)})
                log.error("failed writing %s: %s", name, exc)
        return ProcessingResult(
            success=not failed,
            message=f"Created {len(created)} trusted parquet tables"
            + (f", {len(failed)} failed" if failed else ""),
            metadata={
                "ingestion_date": self.ingestion_date,
                "failed": failed,
                "format": "PARQUET",
                "compression": "SNAPPY",
                "partitioned": True,
            },
            rows_processed=len(created),
            tables_created=created,
        )

    # -- post-process ------------------------------------------------------
    def _post_process(self, load_result: ProcessingResult) -> None:
        """Register trusted outputs as temp views (≙ the reference's
        DuckDB view bootstrap, duckdb_client.py:308-348 — but lazy: a
        temp view over parquet scans nothing until queried)."""
        for name in load_result.tables_created:
            schema = self.registry[name]
            df = self.spark.read.parquet(self.lake.trusted_path(schema.suffix))
            df.createOrReplaceTempView(name)
