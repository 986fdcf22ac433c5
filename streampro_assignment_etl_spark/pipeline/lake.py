"""Zoned-lake storage utilities (SURVEY §2.1 S6–S10).

Driver-side object operations over a lake root with ``landing/``,
``raw/`` and ``trusted/`` prefixes — the Spark-facing counterpart of
the reference's MinIO client surface
(/root/reference/src/connect/minio_client.py:29-136) and its
filename→(table, date) contract
(/root/reference/src/core/landing_to_raw_processor.py:70-98).

These are metadata/byte operations, not data-plane work: on a cluster
they run on the driver against S3/HDFS via fsspec or the Hadoop
FileSystem API, never through executors — copying a landing file into
``raw/ingestion_date=…/`` moves no data through Python on any path
(server-side copy on S3, rename on HDFS). Local filesystem backing
keeps tests hermetic; the layout (Hive-style partition directories) is
identical on any Hadoop-compatible store, so ``file://`` here swaps
for ``s3a://`` in production with no code change above this module.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path

LANDING_PREFIX = "landing"
RAW_PREFIX = "raw"
TRUSTED_PREFIX = "trusted"

_DATA_SUFFIXES = (".csv", ".json", ".jsonl")


@dataclass(frozen=True)
class LandingFile:
    """A discovered landing object, parsed per the filename contract."""

    landing_key: str  # lake-relative key, e.g. "landing/users_2025-09-09.csv"
    name: str  # file name, e.g. "users_2025-09-09.csv"
    table_type: str  # e.g. "users"
    file_date: str  # "YYYY-MM-DD"
    raw_key: str  # "raw/ingestion_date=<date>/<name>"


def parse_landing_filename(name: str, default_date: str) -> tuple[str, str]:
    """``<table>_<YYYY-MM-DD>.<ext>`` → (table, date); undated files get
    ``default_date`` (reference contract,
    landing_to_raw_processor.py:73-88: date = stem's last ``_`` segment
    iff it contains exactly two dashes)."""
    stem = Path(name).stem
    parts = stem.split("_")
    if len(parts) > 1 and parts[-1].count("-") == 2:
        return "_".join(parts[:-1]), parts[-1]
    return stem, default_date


class LakeStorage:
    """Object store facade over one lake root directory/URI."""

    def __init__(self, root: str | Path):
        self.root = Path(root)

    # -- S9: bucket bootstrap + seed ------------------------------------
    def ensure_zones(self) -> None:
        """Create the bucket/zone layout (≙ MinIO ensure-bucket +
        docker-init seed step, minio_client.py:29-36)."""
        for prefix in (LANDING_PREFIX, RAW_PREFIX, TRUSTED_PREFIX):
            (self.root / prefix).mkdir(parents=True, exist_ok=True)

    def seed_landing(self, data_dir: str | Path) -> list[str]:
        """Copy fixture files into landing/ (≙ docker-compose seed,
        /root/reference/docker-compose.yml:24-52)."""
        self.ensure_zones()
        seeded = []
        for f in sorted(Path(data_dir).iterdir()):
            if f.suffix in _DATA_SUFFIXES:
                key = f"{LANDING_PREFIX}/{f.name}"
                self.upload_file(f, key)
                seeded.append(key)
        return seeded

    # -- S6: listing / discovery ----------------------------------------
    def list_objects(self, prefix: str = "") -> list[str]:
        """Recursive key listing under a prefix (minio_client.py:106-112)."""
        base = self.root / prefix if prefix else self.root
        if not base.exists():
            return []
        return sorted(
            str(p.relative_to(self.root)) for p in base.rglob("*") if p.is_file()
        )

    # -- S7: server-side copy -------------------------------------------
    def copy_object(self, source_key: str, target_key: str) -> None:
        """Byte-identical copy within the lake (minio_client.py:114-124).
        On S3 this is CopyObject (server-side, zero egress)."""
        src = self.root / source_key
        dst = self.root / target_key
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src, dst)

    # -- S8: upload / download / delete / url ---------------------------
    def upload_file(self, local_path: str | Path, key: str) -> None:
        dst = self.root / key
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(local_path, dst)

    def download_file(self, key: str, local_path: str | Path) -> None:
        Path(local_path).parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(self.root / key, local_path)

    def delete_object(self, key: str) -> bool:
        p = self.root / key
        if p.is_file():
            p.unlink()
            return True
        return False

    def get_object_url(self, key: str) -> str:
        """Spark-readable URI for a key (≙ get_object_url,
        minio_client.py:135-136)."""
        return (self.root / key).resolve().as_uri()

    def exists(self, key: str) -> bool:
        return (self.root / key).exists()

    # -- S10-adjacent path builders -------------------------------------
    def raw_partition_key(self, ingestion_date: str, file_name: str) -> str:
        return f"{RAW_PREFIX}/ingestion_date={ingestion_date}/{file_name}"

    def raw_file_path(self, ingestion_date: str, table: str, fmt: str) -> str:
        """Exact raw object path for one table+date (manual partition
        pruning by path construction, raw_to_trusted_processor.py:98)."""
        ext = "jsonl" if fmt == "jsonl" else "csv"
        return str(
            self.root / RAW_PREFIX / f"ingestion_date={ingestion_date}" / f"{table}_{ingestion_date}.{ext}"
        )

    def trusted_path(self, location_suffix: str) -> str:
        """Trusted table root (partition dirs live below it)."""
        return str(self.root / TRUSTED_PREFIX / location_suffix)

    def discover_landing(self, ingestion_date: str) -> dict[str, LandingFile]:
        """S6+S10: list landing/, parse filenames, keep files matching the
        target date (landing_to_raw_processor.py:57-105). Returns
        {table_type: LandingFile}; later files win on duplicates, same as
        the reference's dict overwrite."""
        found: dict[str, LandingFile] = {}
        for key in self.list_objects(LANDING_PREFIX):
            name = key.rsplit("/", 1)[-1]
            if not name.endswith(_DATA_SUFFIXES):
                continue
            table_type, file_date = parse_landing_filename(name, ingestion_date)
            if file_date != ingestion_date:
                continue
            found[table_type] = LandingFile(
                landing_key=key,
                name=name,
                table_type=table_type,
                file_date=file_date,
                raw_key=self.raw_partition_key(file_date, name),
            )
        return found
