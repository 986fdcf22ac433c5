"""Job/result model + template-method processor (SURVEY §1.1 row 8).

Reproduces the reference's job framework semantics —
``JobStatus``/``JobResult``/``ProcessingResult`` dataclasses and the
``_pre_process → _extract → _transform → _load → _post_process``
template (/root/reference/src/core/base_processor.py:10-136) — with the
pandas/MinIO internals replaced by Spark DataFrames and a pluggable
lake root. Written fresh against that behavioral contract; no code is
copied.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum
from typing import Any

log = logging.getLogger("streampro.pipeline")


class JobStatus(Enum):
    SUCCESS = "success"
    FAILED = "failed"


@dataclass
class ProcessingResult:
    """Outcome of one processor's load stage.

    Mirrors /root/reference/src/core/base_processor.py:36-47.
    """

    success: bool
    message: str
    metadata: dict[str, Any] = field(default_factory=dict)
    rows_processed: int = 0
    tables_created: list[str] = field(default_factory=list)


@dataclass
class JobResult:
    """Terminal result of a processor run.

    Mirrors /root/reference/src/core/base_processor.py:15-33.
    """

    job_id: str
    status: JobStatus
    start_time: datetime | None = None
    end_time: datetime | None = None
    duration_seconds: float | None = None
    message: str | None = None
    error: str | None = None
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def is_success(self) -> bool:
        return self.status == JobStatus.SUCCESS


class BaseProcessor(ABC):
    """ETL template method: extract → transform → load, with hooks.

    Behavioral contract from /root/reference/src/core/base_processor.py:50-136:
    any stage raising turns into a FAILED JobResult (never an exception
    escaping ``run``), and timing is captured around the whole template.
    """

    def __init__(self, processor_id: str, description: str = ""):
        self.processor_id = processor_id
        self.description = description

    def run(self) -> JobResult:
        start = datetime.now(timezone.utc)
        try:
            self._pre_process()
            extracted = self._extract()
            transformed = self._transform(extracted)
            load_result = self._load(transformed)
            self._post_process(load_result)
            end = datetime.now(timezone.utc)
            status = JobStatus.SUCCESS if load_result.success else JobStatus.FAILED
            return JobResult(
                job_id=self.processor_id,
                status=status,
                start_time=start,
                end_time=end,
                duration_seconds=(end - start).total_seconds(),
                message=load_result.message,
                error=None if load_result.success else load_result.message,
                metadata={
                    **load_result.metadata,
                    "rows_processed": load_result.rows_processed,
                    "tables_created": load_result.tables_created,
                },
            )
        except Exception as exc:  # noqa: BLE001 — contract: never escape run()
            end = datetime.now(timezone.utc)
            log.exception("processor %s failed", self.processor_id)
            return JobResult(
                job_id=self.processor_id,
                status=JobStatus.FAILED,
                start_time=start,
                end_time=end,
                duration_seconds=(end - start).total_seconds(),
                error=str(exc),
            )

    def _pre_process(self) -> None:
        """Optional setup hook."""

    @abstractmethod
    def _extract(self) -> Any: ...

    @abstractmethod
    def _transform(self, extracted: Any) -> Any: ...

    @abstractmethod
    def _load(self, transformed: Any) -> ProcessingResult: ...

    def _post_process(self, load_result: ProcessingResult) -> None:
        """Optional post-load hook (catalog registration, stats)."""

    def cleanup(self) -> None:
        """Optional resource cleanup, called by the job runner."""
