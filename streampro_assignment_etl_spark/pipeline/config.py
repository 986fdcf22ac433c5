"""Env-driven settings (≙ /root/reference/src/utils/config.py:7-56 and
config/*.env).

Same layering contract without the pydantic dependency: an ``ENV``
name selects ``config/<env>.env`` (falling back to ``config/dev.env``),
process environment variables override file values, and unset keys get
code defaults. MinIO/Trino endpoints are replaced by the lake root and
Spark master — the only connection Spark needs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields
from pathlib import Path

DEFAULTS = {
    "ENV": "dev",
    "LAKE_ROOT": "./lake",
    "LANDING_PREFIX": "landing",
    "RAW_PREFIX": "raw",
    "TRUSTED_PREFIX": "trusted",
    "SPARK_MASTER": "",  # empty -> session.py picks local[cpus]
    "LOG_LEVEL": "INFO",
}


def _parse_env_file(path: Path) -> dict[str, str]:
    out: dict[str, str] = {}
    if not path.is_file():
        return out
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        out[k.strip()] = v.strip()
    return out


@dataclass(frozen=True)
class Settings:
    ENV: str = "dev"
    LAKE_ROOT: str = "./lake"
    LANDING_PREFIX: str = "landing"
    RAW_PREFIX: str = "raw"
    TRUSTED_PREFIX: str = "trusted"
    SPARK_MASTER: str = ""
    LOG_LEVEL: str = "INFO"
    source_file: str = field(default="", compare=False)


def get_settings(env: str | None = None, config_dir: str | Path = "config") -> Settings:
    """Resolve settings for an environment.

    Precedence (highest first): process env vars → ``<env>.env`` file →
    ``dev.env`` fallback file → code defaults. Mirrors the reference's
    get_settings (ENV selects the file; missing file falls back to dev).
    """
    env_name = (env or os.environ.get("ENV", "dev")).lower()
    cfg = Path(config_dir)
    env_path = cfg / f"{env_name}.env"
    if not env_path.is_file():
        env_path = cfg / "dev.env"
    file_vals = _parse_env_file(env_path)

    values: dict[str, str] = {}
    for f in fields(Settings):
        if f.name == "source_file":
            continue
        values[f.name] = os.environ.get(
            f.name, file_vals.get(f.name, DEFAULTS[f.name])
        )
    values["ENV"] = env_name
    return Settings(source_file=str(env_path) if file_vals else "", **values)
