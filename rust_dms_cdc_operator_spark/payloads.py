"""Configuration payloads — the engine's public parameter surface.

Mirrors the reference's payload builders (parity targets:
``/root/reference/src/cdc/snapshot_payload.rs:23-52``,
``validate_payload.rs:15-40``, ``cdc_operator_payload.rs:72-74``,
mode enums ``cdc_operator_mode.rs:11-16`` and ``table_mode.rs:1-5``)
but as plain dataclasses with the same invariants:

- ``DATE_AWARE`` mode requires ``start_date`` (reference panics at
  ``cdc_operator.rs:116-118``).
- ``only_datadiff`` and ``only_snapshot`` are mutually exclusive
  (``cdc_operator_payload.rs:72-74``).
- Non-empty ``included_tables`` wins over ``excluded_tables``
  (``snapshot_payload.rs:78-86``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class LoadMode(Enum):
    """How Parquet files are discovered (cdc_operator_mode.rs:11-16)."""

    DATE_AWARE = "date-aware"
    FULL_LOAD_ONLY = "full-load-only"
    ABSOLUTE_PATH = "absolute-path"


class TableMode(Enum):
    """Include/exclude semantics for table discovery (table_mode.rs:1-5)."""

    ALL = "all"
    INCLUDE = "include"
    EXCLUDE = "exclude"


def resolve_table_mode(
    included_tables: list[str], excluded_tables: list[str]
) -> TableMode:
    """Reference resolution order: included wins, then excluded, else all
    (snapshot_payload.rs:78-86)."""
    if included_tables:
        return TableMode.INCLUDE
    if excluded_tables:
        return TableMode.EXCLUDE
    return TableMode.ALL


@dataclass
class ConnConfig:
    """Postgres connection settings (postgres_config.rs:54-82)."""

    url: str
    max_connections: int = 100
    accept_invalid_certs: bool = False
    properties: dict[str, str] = field(default_factory=dict)

    def jdbc_properties(self) -> dict[str, str]:
        """JDBC connection properties with the reference's TLS stance
        applied (postgres_config.rs:68-78: accept-invalid-certs builds
        a danger-mode TLS connector): the pg-JDBC equivalent is
        ssl=true with the non-validating factory. Explicit user
        properties always win."""
        props: dict[str, str] = {}
        if self.accept_invalid_certs:
            props["ssl"] = "true"
            props["sslfactory"] = "org.postgresql.ssl.NonValidatingFactory"
        props.update(self.properties)
        return props


@dataclass
class CdcSnapshotPayload:
    """Parameters for the snapshot pipeline (snapshot_payload.rs:23-52)."""

    bucket_name: str
    schema_name: str
    included_tables: list[str] = field(default_factory=list)
    excluded_tables: list[str] = field(default_factory=list)
    mode: LoadMode = LoadMode.DATE_AWARE
    start_date: str | None = None
    stop_date: str | None = None
    database_name: str = ""
    s3_prefix: str = ""
    source: ConnConfig | None = None
    target: ConnConfig | None = None

    def __post_init__(self) -> None:
        if self.mode is LoadMode.DATE_AWARE and not self.start_date:
            raise ValueError(
                "start_date is required in DATE_AWARE mode "
                "(reference: cdc_operator.rs:116-118)"
            )

    @property
    def table_mode(self) -> TableMode:
        return resolve_table_mode(self.included_tables, self.excluded_tables)


@dataclass
class CdcValidatePayload:
    """Parameters for the validate (datadiff) pipeline
    (validate_payload.rs:15-40; option surface cdc_operator.rs:268-287)."""

    schema_name: str
    included_tables: list[str] = field(default_factory=list)
    excluded_tables: list[str] = field(default_factory=list)
    chunk_size: int = 1000
    start_position: int = 0
    max_connections: int = 100
    # pgdatadiff surface parity: the reference pins only_sequences(false)
    # (cdc_operator.rs:271-272) but the option exists in its dependency's
    # DiffPayload; when true, validate compares sequence last_value
    # instead of table data (validate.sequence_diff)
    only_sequences: bool = False
    source: ConnConfig | None = None
    target: ConnConfig | None = None

    @property
    def table_mode(self) -> TableMode:
        return resolve_table_mode(self.included_tables, self.excluded_tables)


@dataclass
class CdcOperatorPayload:
    """Top-level run config (cdc_operator_payload.rs; main.rs:119-165)."""

    snapshot: CdcSnapshotPayload | None = None
    validate: CdcValidatePayload | None = None
    only_snapshot: bool = False
    only_datadiff: bool = False

    def __post_init__(self) -> None:
        if self.only_snapshot and self.only_datadiff:
            # byte-for-byte the reference's panic message
            # (cdc_operator_payload.rs:72-74)
            raise ValueError(
                "Cannot run both only_datadiff and only_snapshot at the same time"
            )
