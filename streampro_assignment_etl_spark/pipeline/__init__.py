"""Zoned ETL pipeline: landing → raw → trusted on Spark.

Spark-first re-expression of the reference's medallion pipeline
(/root/reference/src/core/*_processor.py, src/jobs/*): typed schema
registry, driver-side lake/object ops, template-method processors, and
an argparse CLI. See SURVEY.md §2.1 (S1–S10), §2.4 (P1), §3.
"""

from .base import BaseProcessor, JobResult, JobStatus, ProcessingResult
from .lake import LakeStorage, parse_landing_filename
from .landing_to_raw import LandingToRawProcessor
from .raw_to_trusted import RawToTrustedProcessor
from .schemas import STREAMPRO_TABLES, TESTDATA_TABLES, TableSchema, all_tables, get_schema

__all__ = [
    "BaseProcessor",
    "JobResult",
    "JobStatus",
    "ProcessingResult",
    "LakeStorage",
    "parse_landing_filename",
    "LandingToRawProcessor",
    "RawToTrustedProcessor",
    "STREAMPRO_TABLES",
    "TESTDATA_TABLES",
    "TableSchema",
    "all_tables",
    "get_schema",
]
