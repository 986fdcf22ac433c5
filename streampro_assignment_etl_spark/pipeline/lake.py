"""Zoned-lake storage utilities (SURVEY §2.1 S6–S10).

Driver-side object operations over a lake root with ``landing/``,
``raw/`` and ``trusted/`` prefixes — the Spark-facing counterpart of
the reference's MinIO client surface
(/root/reference/src/connect/minio_client.py:29-136) and its
filename→(table, date) contract
(/root/reference/src/core/landing_to_raw_processor.py:70-98).

These are metadata/byte operations, not data-plane work: on a cluster
they run on the driver, never through executors. Every zone op routes
through a ``pyarrow.fs.FileSystem`` — the REAL seam: a local path root
gets ``LocalFileSystem``, an ``s3://…`` / ``gs://…`` / ``hdfs://…``
root resolves via ``FileSystem.from_uri`` to the matching object-store
client (CopyObject server-side copy on S3, rename on HDFS), and tests
exercise a non-local in-memory filesystem through the ``filesystem=``
injection point. Spark-readable locations (``raw_file_path`` /
``trusted_path`` / ``uri``) come back as plain paths for local roots
and scheme-qualified URIs otherwise (``s3://`` is emitted as ``s3a://``
for Hadoop's connector), so the pipeline code above this module is
byte-identical across stores.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import pyarrow.fs as pafs

LANDING_PREFIX = "landing"
RAW_PREFIX = "raw"
TRUSTED_PREFIX = "trusted"

_DATA_SUFFIXES = (".csv", ".json", ".jsonl")

# Hadoop connectors name some schemes differently from pyarrow.
_SPARK_SCHEME = {"s3": "s3a"}


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
    """Object store facade over one lake root directory/URI.

    ``root`` may be a local path (tests, single-node), a filesystem URI
    (``s3://bucket/lake``, ``hdfs://nn/lake``, ``file:///…``), or any
    base path valid inside an explicitly injected ``filesystem``
    (``pyarrow.fs.FileSystem`` instance — how tests run the whole
    pipeline against an in-memory store).
    """

    def __init__(
        self,
        root: str | Path,
        filesystem: pafs.FileSystem | None = None,
        scheme: str | None = None,
    ):
        """``scheme`` sets the URI scheme ``uri()`` emits when a
        filesystem is injected directly (there is no URI to parse it
        from) — e.g. ``LakeStorage("bucket/lake", filesystem=s3fs,
        scheme="s3")`` so Spark-facing paths come back ``s3a://…``
        instead of bare in-filesystem paths."""
        s = str(root)
        self._authority = ""  # host[:port] for hdfs://-style roots
        if filesystem is not None:
            self.fs = filesystem
            self._base = s.rstrip("/")
            self._scheme = scheme
            self.root = Path(s)  # best-effort; meaningful only for local fs
        elif "://" in s:
            from urllib.parse import urlsplit

            self.fs, base = pafs.FileSystem.from_uri(s)
            self._base = base.rstrip("/")
            parts = urlsplit(s)
            self._scheme = None if parts.scheme == "file" else parts.scheme
            # Authority handling differs per store: S3/GCS fold the
            # bucket into the returned path ("bucket/lake"), while HDFS
            # consumes host:port into the filesystem object and returns
            # a bare "/lake" — in that case keep the authority so
            # emitted URIs stay fully qualified (hdfs://nn:8020/...).
            if self._base.startswith("/") and parts.netloc:
                self._authority = parts.netloc
            self.root = Path(self._base)
        else:
            self.fs = pafs.LocalFileSystem()
            self._base = str(Path(s).absolute())
            self._scheme = None
            self.root = Path(s)

    # -- path algebra ----------------------------------------------------
    def _abs(self, key: str) -> str:
        """Filesystem-internal absolute path for a lake-relative key."""
        return f"{self._base}/{key}" if key else self._base

    @property
    def spark_readable(self) -> bool:
        """Whether ``uri()`` can emit a location Spark's JVM readers can
        open. False exactly when a NON-local filesystem was injected
        without ``scheme``: its paths are meaningful only inside that
        Python-side filesystem object, and handing them to Spark would
        silently resolve against the local filesystem. Pipelines route
        Spark I/O through ``stage_in``/``stage_out`` in that case."""
        return self._scheme is not None or isinstance(self.fs, pafs.LocalFileSystem)

    def uri(self, *parts: str) -> str:
        """Spark-readable location for a lake-relative path: plain path
        for local roots, scheme-qualified URI otherwise (s3 → s3a for
        the Hadoop connector). Raises for an injected non-local
        filesystem without ``scheme`` — a bare in-filesystem path like
        ``bucket/lake/raw/...`` would be a SILENT local-fs misread, not
        a Spark-readable location."""
        if not self.spark_readable:
            raise ValueError(
                "no Spark-readable location exists for this lake: a non-local "
                "filesystem was injected without scheme=; use stage_in()/"
                "stage_out() for Spark I/O, or pass scheme='s3' etc. if the "
                "store is also mounted for Spark"
            )
        p = "/".join([self._base, *[str(x) for x in parts if str(x)]])
        if self._scheme is None:
            return p
        return f"{_SPARK_SCHEME.get(self._scheme, self._scheme)}://{self._authority}{p}"

    # -- staging bridge for non-Spark-readable stores --------------------
    def stage_in(self, prefix: str, local_dir: str | Path) -> str:
        """Download every object under a lake prefix into ``local_dir``,
        preserving the relative layout; returns the local root holding
        the subtree. The bridge that lets Spark read from a lake whose
        filesystem the JVM has no connector for (e.g. the in-memory test
        store): bytes flow through the ``pyarrow.fs`` seam, Spark reads
        local files. Driver-side like every zone op — size accordingly
        (raw zone objects for one ingestion date, not a corpus)."""
        local_root = Path(local_dir)
        for key in self.list_objects(prefix):
            self.download_file(key, local_root / key)
        return str(local_root / prefix)

    def stage_out(self, local_dir: str | Path, prefix: str) -> list[str]:
        """Upload a local directory subtree to a lake prefix, replacing
        whatever the prefix held (the staged dir is the new truth for
        that subtree — callers stage exactly the partitions they
        rewrote). Returns the uploaded keys.

        Order is upload-first, then delete stale keys: puts overwrite
        in place, so a transient store error mid-operation leaves a mix
        of old and new objects — a re-run converges — whereas the
        reverse order has a window where the old partition is deleted
        and nothing has landed yet, turning a retryable network blip
        into data loss on exactly the remote stores this bridge
        targets. (Spark part files are UUID-named, so old part files
        are always in the stale set, never silently shadowed.)"""
        local_root = Path(local_dir)
        existing = set(self.list_objects(prefix))
        uploaded = []
        for f in sorted(local_root.rglob("*")):
            if f.is_file():
                key = f"{prefix}/{f.relative_to(local_root)}"
                self.upload_file(f, key)
                uploaded.append(key)
        for key in existing - set(uploaded):
            self.delete_object(key)
        return uploaded

    # -- S9: bucket bootstrap + seed ------------------------------------
    def ensure_zones(self) -> None:
        """Create the bucket/zone layout (≙ MinIO ensure-bucket +
        docker-init seed step, minio_client.py:29-36)."""
        for prefix in (LANDING_PREFIX, RAW_PREFIX, TRUSTED_PREFIX):
            self.fs.create_dir(self._abs(prefix), recursive=True)

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
        sel = pafs.FileSelector(
            self._abs(prefix), recursive=True, allow_not_found=True
        )
        infos = self.fs.get_file_info(sel)
        skip = len(self._base) + 1
        return sorted(
            i.path[skip:] for i in infos if i.type == pafs.FileType.File
        )

    # -- S7: server-side copy -------------------------------------------
    def copy_object(self, source_key: str, target_key: str) -> None:
        """Byte-identical copy within the lake (minio_client.py:114-124).
        On S3 this is CopyObject (server-side, zero egress)."""
        dst = self._abs(target_key)
        parent = dst.rsplit("/", 1)[0]
        self.fs.create_dir(parent, recursive=True)
        self.fs.copy_file(self._abs(source_key), dst)

    # -- S8: upload / download / delete / url ---------------------------
    def upload_file(self, local_path: str | Path, key: str) -> None:
        # compression=None: pyarrow streams default to extension-based
        # transparent (de)compression, which would silently mangle a
        # byte-identical object copy of *.gz/*.bz2 keys.
        dst = self._abs(key)
        self.fs.create_dir(dst.rsplit("/", 1)[0], recursive=True)
        with open(local_path, "rb") as src, self.fs.open_output_stream(
            dst, compression=None
        ) as out:
            while chunk := src.read(1 << 20):
                out.write(chunk)

    def download_file(self, key: str, local_path: str | Path) -> None:
        Path(local_path).parent.mkdir(parents=True, exist_ok=True)
        with self.fs.open_input_stream(
            self._abs(key), compression=None
        ) as src, open(local_path, "wb") as out:
            while chunk := src.read(1 << 20):
                out.write(chunk)

    def delete_object(self, key: str) -> bool:
        # File-only, like the shutil-era is_file() guard: directory /
        # missing keys return False instead of raising.
        info = self.fs.get_file_info(self._abs(key))
        if info.type != pafs.FileType.File:
            return False
        self.fs.delete_file(self._abs(key))
        return True

    def get_object_url(self, key: str) -> str:
        """Spark-readable URI for a key (≙ get_object_url,
        minio_client.py:135-136). Same guard as ``uri()``: an injected
        non-local filesystem without ``scheme`` has no emittable URL."""
        if not self.spark_readable:
            raise ValueError(
                "no Spark-readable URL exists for this lake: a non-local "
                "filesystem was injected without scheme="
            )
        if self._scheme is None:
            return Path(self._abs(key)).resolve().as_uri()
        return self.uri(key)

    def exists(self, key: str) -> bool:
        info = self.fs.get_file_info(self._abs(key))
        return info.type != pafs.FileType.NotFound

    # -- S10-adjacent path builders -------------------------------------
    def raw_partition_key(self, ingestion_date: str, file_name: str) -> str:
        return f"{RAW_PREFIX}/ingestion_date={ingestion_date}/{file_name}"

    def raw_file_path(self, ingestion_date: str, table: str, fmt: str) -> str:
        """Exact raw object path for one table+date (manual partition
        pruning by path construction, raw_to_trusted_processor.py:98)."""
        ext = "jsonl" if fmt == "jsonl" else "csv"
        return self.uri(
            RAW_PREFIX,
            f"ingestion_date={ingestion_date}",
            f"{table}_{ingestion_date}.{ext}",
        )

    def trusted_path(self, location_suffix: str) -> str:
        """Trusted table root (partition dirs live below it)."""
        return self.uri(TRUSTED_PREFIX, location_suffix)

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
