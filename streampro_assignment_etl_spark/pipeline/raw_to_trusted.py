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

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import BaseProcessor, ProcessingResult
from .lake import LakeStorage, TRUSTED_PREFIX
from .schemas import STREAMPRO_TABLES, TableSchema
from .writers import write_orc, write_parquet

log = logging.getLogger("streampro.pipeline.raw_to_trusted")


class RawToTrustedProcessor(BaseProcessor):
    """Raw → trusted parse/load.

    ``bad_rows`` policy (the reference's pandas path silently coerces —
    neither option does):
      * "fail" (default): FAILFAST — any malformed row aborts the table.
      * "quarantine": PERMISSIVE with a ``_corrupt_record`` capture —
        clean rows land in trusted, raw malformed lines land under
        ``quarantine/<table>/ingestion_date=<d>/`` for replay/triage.
        This is the production posture at 100 TB: one bad line in a
        billion must neither kill the job nor vanish.
    """

    def __init__(
        self,
        spark: SparkSession,
        lake: LakeStorage,
        ingestion_date: str,
        registry: dict[str, TableSchema] | None = None,
        bad_rows: str = "fail",
        trusted_format: str = "parquet",
        register_views: bool = True,
        max_null_fraction: float | None = None,
    ):
        """``trusted_format`` selects the columnar sink for the trusted
        zone: ``"parquet"`` (default, reference parity) or ``"orc"``
        (Spark-core source; for lakes serving Hive/Trino warehouses
        that mandate ORC). Reads, typing, partitioning, and the
        per-date overwrite contract are format-independent.

        ``register_views=False`` skips the post-process view
        registration — for backfill loops, where only the FINAL date's
        views matter and, on a non-Spark-readable lake, each
        registration would re-download the whole trusted subtree
        (quadratic transfer over the backfill).

        ``max_null_fraction`` arms the in-flight quality gate
        (``observability.quality_gate``): per-table row + null counts
        ride the trusted write itself via ``Observation`` (no second
        scan) and land in ``ProcessingResult.metadata["observed"]``;
        any column whose null fraction exceeds the budget is recorded
        in ``metadata["quality_violations"]``. ``None`` (default)
        still collects the metrics, just never flags."""
        super().__init__(
            "raw_to_trusted_processor",
            "Parse raw CSV/JSONL into typed, partitioned trusted parquet",
        )
        if bad_rows not in ("fail", "quarantine"):
            raise ValueError("bad_rows must be 'fail' or 'quarantine'")
        if trusted_format not in ("parquet", "orc"):
            raise ValueError("trusted_format must be 'parquet' or 'orc'")
        self.spark = spark
        self.lake = lake
        self.ingestion_date = ingestion_date
        self.registry = registry or STREAMPRO_TABLES
        self.bad_rows = bad_rows
        self.trusted_format = trusted_format
        self.register_views = register_views
        self.max_null_fraction = max_null_fraction
        # Local staging bridge, created lazily iff the lake's filesystem
        # is not Spark-readable (injected non-local fs without scheme):
        # raw bytes stage in through the pyarrow.fs seam for Spark to
        # read, trusted parquet stages back out. mkdtemp, not
        # TemporaryDirectory: registered temp views keep reading the
        # staged trusted files after run() returns, so the dir must
        # outlive the processor until cleanup()/process exit.
        self._staging: str | None = None

    def _staging_dir(self) -> "Path":
        from pathlib import Path

        if self._staging is None:
            import tempfile

            self._staging = tempfile.mkdtemp(prefix="streampro_stage_")
        return Path(self._staging)

    def cleanup(self) -> None:
        if self._staging is not None:
            import shutil

            shutil.rmtree(self._staging, ignore_errors=True)
            self._staging = None

    def _read_schema(self, schema: TableSchema) -> "T.StructType":
        from pyspark.sql import types as T

        if self.bad_rows == "fail":
            return schema.struct
        return T.StructType(
            list(schema.struct.fields)
            + [T.StructField("_corrupt_record", T.StringType())]
        )

    # -- extract ---------------------------------------------------------
    def read_csv(self, path: str, schema: TableSchema) -> DataFrame:
        """S1 — typed, header-aware CSV read
        (≙ MinIOClient.read_csv, minio_client.py:96-104)."""
        reader = (
            self.spark.read.schema(self._read_schema(schema))
            .option("header", True)
            .option(
                "mode", "FAILFAST" if self.bad_rows == "fail" else "PERMISSIVE"
            )
            .option("columnNameOfCorruptRecord", "_corrupt_record")
        )
        return reader.csv(path)

    def read_jsonl(self, path: str, schema: TableSchema) -> DataFrame:
        """S2 — typed JSONL read; Spark's JSON source is line-delimited by
        default (≙ extract_jsonl, raw_to_trusted_processor.py:60-79)."""
        reader = (
            self.spark.read.schema(self._read_schema(schema))
            .option(
                "mode", "FAILFAST" if self.bad_rows == "fail" else "PERMISSIVE"
            )
            .option("columnNameOfCorruptRecord", "_corrupt_record")
        )
        return reader.json(path)

    def _extract(self) -> dict[str, DataFrame]:
        out: dict[str, DataFrame] = {}
        for name, schema in self.registry.items():
            table_key = schema.suffix
            ext = "jsonl" if schema.fmt == "jsonl" else "csv"
            raw_key = self.lake.raw_partition_key(
                self.ingestion_date, f"{table_key}_{self.ingestion_date}.{ext}"
            )
            if not self.lake.exists(raw_key):
                log.warning(
                    "raw file missing for %s (%s) — skipping", table_key, raw_key
                )
                continue
            if self.lake.spark_readable:
                path = self.lake.raw_file_path(
                    self.ingestion_date, table_key, schema.fmt
                )
            else:
                # Stage the raw object through the fs seam so Spark can
                # read it from local disk.
                local = self._staging_dir() / raw_key
                self.lake.download_file(raw_key, local)
                path = str(local)
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

    def _write_trusted(self, df: DataFrame, schema: TableSchema) -> None:
        """Write trusted parquet straight to the lake, or — for a
        non-Spark-readable lake filesystem — to local staging, then
        upload through the fs seam at PARTITION granularity so the
        per-ingestion-date overwrite contract holds (a whole-suffix
        replace would delete other dates' partitions)."""
        write = write_orc if self.trusted_format == "orc" else write_parquet
        if self.lake.spark_readable:
            write(
                df, self.lake.trusted_path(schema.suffix), schema.partition_cols
            )
            return
        local = self._staging_dir() / "out" / schema.suffix
        write(df, str(local), schema.partition_cols)
        if schema.partition_cols:
            for pdir in sorted(local.glob(f"{schema.partition_cols[0]}=*")):
                self.lake.stage_out(
                    pdir, f"{TRUSTED_PREFIX}/{schema.suffix}/{pdir.name}"
                )
        else:
            self.lake.stage_out(local, f"{TRUSTED_PREFIX}/{schema.suffix}")

    def _write_quarantine(self, corrupt: DataFrame, schema: TableSchema) -> None:
        part = f"ingestion_date={self.ingestion_date}"
        if self.lake.spark_readable:
            qpath = self.lake.uri("quarantine", schema.suffix, part)
            corrupt.select("_corrupt_record").write.mode("overwrite").text(qpath)
            return
        qlocal = self._staging_dir() / "quarantine" / schema.suffix / part
        corrupt.select("_corrupt_record").write.mode("overwrite").text(str(qlocal))
        self.lake.stage_out(qlocal, f"quarantine/{schema.suffix}/{part}")

    # -- load --------------------------------------------------------------
    def _load(self, transformed: dict[str, DataFrame]) -> ProcessingResult:
        from .observability import observed_quality, quality_gate

        created, failed = [], []
        quarantined: dict[str, int] = {}
        observed: dict[str, dict] = {}
        violations: dict[str, list[str]] = {}
        for name, df in transformed.items():
            schema = self.registry[name]
            try:
                if self.bad_rows == "quarantine" and "_corrupt_record" in df.columns:
                    # Persist before splitting: Spark disallows filtering
                    # on the corrupt-record column of an unmaterialized
                    # PERMISSIVE read.
                    df = df.persist()
                    corrupt = df.filter(F.col("_corrupt_record").isNotNull())
                    n_bad = corrupt.count()
                    if n_bad:
                        self._write_quarantine(corrupt, schema)
                        quarantined[name] = n_bad
                    df = df.filter(F.col("_corrupt_record").isNull()).drop(
                        "_corrupt_record"
                    )
                # In-flight accounting: row/null counts ride the write
                # action itself (Observation — no second scan; see
                # observability.py), then feed the optional null gate.
                qcols = [f.name for f in schema.struct.fields]
                obs_df, obs = observed_quality(df, qcols, name=f"quality_{name}")
                self._write_trusted(obs_df, schema)
                observed[name] = dict(obs.get)
                if self.max_null_fraction is not None:
                    probs = quality_gate(
                        observed[name], self.max_null_fraction, qcols
                    )
                    if probs:
                        violations[name] = probs
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
                "quarantined": quarantined,
                "format": self.trusted_format.upper(),
                "compression": "SNAPPY",
                "partitioned": True,
                "observed": observed,
                "quality_violations": violations,
            },
            rows_processed=len(created),
            tables_created=created,
        )

    # -- post-process ------------------------------------------------------
    def _post_process(self, load_result: ProcessingResult) -> None:
        """Register trusted outputs as temp views (≙ the reference's
        DuckDB view bootstrap, duckdb_client.py:308-348 — but lazy: a
        temp view over parquet scans nothing until queried). Views are
        registered for EVERY registry table whose trusted zone holds
        data, not just this run's ``tables_created`` — a view covers the
        whole trusted table, so a table skipped THIS date (no raw file —
        e.g. a weekly-delivered feed, or the final date of a backfill)
        must still be queryable over its earlier dates. For a
        non-Spark-readable lake the trusted subtree stages back in
        through the fs seam; those views read the staged copy and live
        until ``cleanup()``/process exit."""
        if not self.register_views:
            return
        for name, schema in self.registry.items():
            if name not in load_result.tables_created and not self.lake.exists(
                f"{TRUSTED_PREFIX}/{schema.suffix}"
            ):
                continue
            if self.lake.spark_readable:
                path = self.lake.trusted_path(schema.suffix)
            else:
                path = self.lake.stage_in(
                    f"{TRUSTED_PREFIX}/{schema.suffix}",
                    self._staging_dir() / "views",
                )
            # Per-table format detection: a trusted zone can mix tables
            # written by earlier runs in the OTHER format (orc vs
            # parquet), so the current run's trusted_format must not
            # decide how every table is read. Sniff the part-file
            # extensions actually present and fall back to this run's
            # format only when ambiguous. Listing is BOUNDED: try this
            # run's own date partition first (one date's files), and
            # only a table with no data for this date pays a full-prefix
            # listing — at warehouse scale the real fix is a format
            # column in a catalog, not ever-larger listings.
            table_prefix = f"{TRUSTED_PREFIX}/{schema.suffix}"
            keys = self.lake.list_objects(
                f"{table_prefix}/ingestion_date={self.ingestion_date}"
            ) or self.lake.list_objects(table_prefix)
            exts = {
                k.rsplit(".", 1)[-1].lower()
                for k in keys
                if "." in k.rsplit("/", 1)[-1]
            }
            if "orc" in exts and "parquet" not in exts:
                fmt = "orc"
            elif "parquet" in exts and "orc" not in exts:
                fmt = "parquet"
            else:
                fmt = self.trusted_format
            reader = self.spark.read.orc if fmt == "orc" else self.spark.read.parquet
            try:
                reader(path).createOrReplaceTempView(name)
            except Exception as exc:  # noqa: BLE001 — re-raised unless known-benign
                # Only the two failure shapes this shield exists for
                # stay a warning: schema inference over an empty/
                # leftover suffix dir (AnalysisException class
                # UNABLE_TO_INFER_SCHEMA — probed; NOT all
                # AnalysisExceptions: a wrong path raises
                # PATH_NOT_FOUND and MUST propagate) and the
                # mixed-format footer error, which surfaces as a raw
                # Py4JJavaError with the FAILED_READ_FILE error class
                # and can hit even a table THIS run wrote (today's orc
                # next to yesterday's parquet). Anything else — wrong
                # staging path, permissions — propagates instead of
                # silently reporting success with missing views.
                benign = (
                    isinstance(exc, AnalysisException)
                    and (exc.getErrorClass() or "") == "UNABLE_TO_INFER_SCHEMA"
                ) or any(
                    marker in str(exc)
                    for marker in ("FAILED_READ_FILE", "CANNOT_READ_FILE_FOOTER")
                )
                if not benign:
                    raise
                logging.getLogger("streampro.raw_to_trusted").warning(
                    "skipping view registration for %s: unreadable at %s",
                    name,
                    path,
                    exc_info=True,
                )
