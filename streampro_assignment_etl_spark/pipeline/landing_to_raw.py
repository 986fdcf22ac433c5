"""Landing → raw processor (SURVEY §2.1 S6/S7/S10, §3.2).

Behavioral parity with
/root/reference/src/core/landing_to_raw_processor.py:57-183: discover
landing files, parse ``<table>_<YYYY-MM-DD>.<ext>`` names, filter to
the target ingestion date, and copy each file as-is into
``raw/ingestion_date=<date>/<name>``. The raw zone is
format-preserving — no parsing, no Spark executors, no data through
Python; this is a metadata/copy job that runs on the driver at any
scale (S3 server-side copy on a real lake)."""

from __future__ import annotations

import logging

from .base import BaseProcessor, ProcessingResult
from .lake import LakeStorage, LandingFile

log = logging.getLogger("streampro.pipeline.landing_to_raw")


class LandingToRawProcessor(BaseProcessor):
    def __init__(self, lake: LakeStorage, ingestion_date: str):
        super().__init__(
            "landing_to_raw_processor",
            "Copy landing data to raw layer with ingestion_date partitioning",
        )
        self.lake = lake
        self.ingestion_date = ingestion_date

    def _extract(self) -> dict[str, LandingFile]:
        files = self.lake.discover_landing(self.ingestion_date)
        log.info("found %d landing files for %s", len(files), self.ingestion_date)
        return files

    def _transform(self, extracted: dict[str, LandingFile]) -> dict[str, LandingFile]:
        # Identity — the raw zone preserves landing bytes exactly
        # (landing_to_raw_processor.py:107-114).
        return extracted

    def _load(self, transformed: dict[str, LandingFile]) -> ProcessingResult:
        copied, failed = [], []
        for table, f in sorted(transformed.items()):
            try:
                self.lake.copy_object(f.landing_key, f.raw_key)
                copied.append(f.raw_key)
            except OSError as exc:
                failed.append({"table": table, "error": str(exc)})
        ok = not failed
        return ProcessingResult(
            success=ok,
            message=f"Copied {len(copied)} files to raw"
            + (f", {len(failed)} failed" if failed else ""),
            metadata={
                "ingestion_date": self.ingestion_date,
                "copied": copied,
                "failed": failed,
            },
            rows_processed=len(copied),
        )
