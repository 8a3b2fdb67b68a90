"""File-manifest construction: discovery, classification, ordering.

Covers SURVEY §2.1 rows S2-S6 (parity targets in the reference:
``/root/reference/src/s3/s3_operator.rs:131-317``). Pure Python —
manifest work is driver-side metadata at any scale (a 100 TB DMS drop
is still only ~10^5-10^6 keys; at that size, switch `list_local` for
a paginated S3 listing which this module's `list_s3` does with the
same filter semantics, and never materialize file *contents* here).

Semantics reproduced from the reference:

- Classification: a file is a full-load file iff its basename contains
  ``"LOAD"`` (s3_operator.rs:43-49).
- Date window (s3_operator.rs:250-262): keep files with
  ``start < last_modified`` and (when stop given) ``last_modified <
  stop`` — both bounds exclusive — OR any LOAD file unconditionally.
- DateAware start key: ``{prefix}/{db}/{schema}/{table}/{Y}/{M:02}/
  {D:02}/`` (s3_operator.rs:145-154); listing begins *after* that key.
- Ordering: LOAD files first (insert mode), then CDC files in
  lexicographic key order — S3 key order == DMS event-time order for
  ``YYYY/MM/DD/YYYYMMDD-HHMMSSmmm.parquet`` names. NOTE: the reference
  snapshot literally drops CDC files in DateAware mode
  (``retain(is_load_file)`` + no-op rotate, s3_operator.rs:178-184);
  we implement the documented *intent* (LOAD-then-CDC). The literal
  behavior is available as ``strict_reference_mode=True``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone


def parse_naive_utc(s: str) -> datetime:
    """ISO date/datetime → naive UTC. The reference documents
    ``%Y-%m-%dT%H:%M:%SZ`` dates (main.rs --start-date docs); Python
    3.11+ parses the trailing ``Z`` as a tz-aware datetime, which
    cannot be compared to the naive-UTC ``last_modified`` values the
    listers produce — so aware inputs are converted to UTC and
    stripped here."""
    d = datetime.fromisoformat(s)
    if d.tzinfo is not None:
        d = d.astimezone(timezone.utc).replace(tzinfo=None)
    return d


@dataclass(frozen=True, order=True)
class ParquetFile:
    """One discovered Parquet object (s3_operator.rs:31-50)."""

    key: str
    last_modified: datetime | None = None

    @property
    def file_name(self) -> str:
        return self.key.rsplit("/", 1)[-1]

    def is_load_file(self) -> bool:
        # substring match on the basename, per s3_operator.rs:43-45
        return "LOAD" in self.file_name

    def is_first_load_file(self) -> bool:
        # s3_operator.rs:47-49
        return self.file_name.startswith("LOAD00000001")


def table_prefix(s3_prefix: str, database: str, schema: str, table: str) -> str:
    """``{prefix}/{db}/{schema}/{table}/`` (s3_operator.rs:150-154)."""
    parts = [p for p in (s3_prefix, database, schema, table) if p]
    return "/".join(parts) + "/"


def date_start_key(
    s3_prefix: str, database: str, schema: str, table: str, start_date: str
) -> str:
    """DateAware listing start key with zero-padded month/day
    (s3_operator.rs:145-154). ``start_date`` is ISO ``YYYY-MM-DD[T..]``."""
    d = parse_naive_utc(start_date)
    return f"{table_prefix(s3_prefix, database, schema, table)}{d.year}/{d.month:02d}/{d.day:02d}/"


def filter_by_date_window(
    files: list[ParquetFile],
    start: datetime | None,
    stop: datetime | None,
) -> list[ParquetFile]:
    """Exclusive (start, stop) window on last_modified; LOAD files are
    always kept (s3_operator.rs:250-262)."""

    def keep(f: ParquetFile) -> bool:
        if f.is_load_file():
            return True
        if f.last_modified is None:
            return False
        if start is not None and not (f.last_modified > start):
            return False
        if stop is not None and not (f.last_modified < stop):
            return False
        return True

    return [f for f in files if keep(f)]


def classify_and_order(
    files: list[ParquetFile], strict_reference_mode: bool = False
) -> list[ParquetFile]:
    """LOAD files first, then CDC files, each group in lexicographic key
    order (the reference's documented intent at s3_operator.rs:178-184;
    ``strict_reference_mode`` reproduces the literal snapshot behavior
    of keeping only LOAD files)."""
    if strict_reference_mode:
        return sorted((f for f in files if f.is_load_file()), key=lambda f: f.key)
    return sorted(files, key=lambda f: (0 if f.is_load_file() else 1, f.key))


def list_local(root: str, prefix: str) -> list[ParquetFile]:
    """Local-filesystem stand-in for ListObjectsV2: every data file
    under ``root/prefix``, with mtime as last_modified (UTC-naive).
    Accepts parquet and csv — DMS's two S3 target formats (the
    reference's S3 listing keeps every key, s3_operator.rs:250-262)."""
    base = os.path.join(root, prefix) if prefix else root
    out: list[ParquetFile] = []
    for dirpath, _dirnames, filenames in os.walk(base):
        for name in filenames:
            if not name.endswith((".parquet", ".csv", ".csv.gz")):
                continue
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, root)
            mtime = datetime.utcfromtimestamp(os.path.getmtime(full))
            out.append(ParquetFile(key=rel.replace(os.sep, "/"), last_modified=mtime))
    return sorted(out, key=lambda f: f.key)


def list_hadoop(root: str, prefix: str) -> list[ParquetFile]:
    """Lister for scheme-qualified roots (``s3a://``, ``hdfs://``,
    ``file://`` …) through the active session's Hadoop FileSystem —
    the connector Spark itself scans with, so the same credentials and
    endpoints apply. One recursive ``listFiles`` call (on s3a: flat
    paginated ListObjectsV2, the reference's exact listing shape,
    s3_operator.rs:210-248). Same filter semantics as ``list_local``."""
    from rust_dms_cdc_operator_spark import fsio  # noqa: PLC0415

    base = fsio.join(root, prefix) if prefix else root
    qroot = fsio.qualified(root).rstrip("/")
    out: list[ParquetFile] = []
    for full, _size, mtime in fsio.walk_files(base):
        if not full.endswith((".parquet", ".csv", ".csv.gz")):
            continue
        rel = full[len(qroot) :].lstrip("/") if full.startswith(qroot) else full
        out.append(
            ParquetFile(
                key=rel, last_modified=datetime.utcfromtimestamp(mtime)
            )
        )
    return sorted(out, key=lambda f: f.key)


def list_s3(
    bucket: str,
    prefix: str,
    start_after: str | None = None,
    client=None,
) -> list[ParquetFile]:
    """Paginated ListObjectsV2 with optional start_after, matching
    s3_operator.rs:210-248. ``client`` is any object with the boto3
    ``list_objects_v2`` contract — injectable so the pagination /
    continuation-token / StartAfter logic is unit-testable without a
    network (tests/test_manifest.py); defaults to a real boto3 client
    (gated import) in production."""
    if client is None:
        try:
            import boto3  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover - boto3 absent in CI image
            raise RuntimeError("boto3 is required for S3 manifests") from exc
        client = boto3.client("s3")
    kwargs: dict = {"Bucket": bucket, "Prefix": prefix}
    if start_after:
        kwargs["StartAfter"] = start_after
    out: list[ParquetFile] = []
    while True:
        resp = client.list_objects_v2(**kwargs)
        for obj in resp.get("Contents", []):
            out.append(
                ParquetFile(
                    key=obj["Key"],
                    last_modified=obj["LastModified"].replace(tzinfo=None),
                )
            )
        if not resp.get("IsTruncated"):
            break
        kwargs["ContinuationToken"] = resp["NextContinuationToken"]
    return out


def build_manifest(
    *,
    mode: "LoadMode | str",
    root: str,
    database: str = "",
    schema: str = "",
    table: str = "",
    s3_prefix: str = "",
    start_date: str | None = None,
    stop_date: str | None = None,
    absolute_path: str | None = None,
    bucket: str | None = None,
    strict_reference_mode: bool = False,
) -> list[ParquetFile]:
    """Mode dispatch (S4, s3_operator.rs:131-208): DateAware /
    FullLoadOnly / AbsolutePath → ordered manifest.

    ``root`` is a local directory unless ``bucket`` is given (then S3).
    """
    from rust_dms_cdc_operator_spark.payloads import LoadMode  # noqa: PLC0415

    from rust_dms_cdc_operator_spark.fsio import is_uri  # noqa: PLC0415

    mode = LoadMode(mode) if isinstance(mode, str) else mode
    if bucket:
        lister = lambda p, sa=None: list_s3(bucket, p, sa)  # noqa: E731
    elif is_uri(root):
        lister = lambda p, sa=None: list_hadoop(root, p)  # noqa: E731
    else:
        lister = lambda p, sa=None: list_local(root, p)  # noqa: E731

    if mode is LoadMode.ABSOLUTE_PATH:
        if not absolute_path:
            raise ValueError("absolute_path required in ABSOLUTE_PATH mode")
        return [ParquetFile(key=absolute_path)]

    prefix = table_prefix(s3_prefix, database, schema, table)

    if mode is LoadMode.FULL_LOAD_ONLY:
        # reference lists `{prefix}LOAD` directly (s3_operator.rs:291-295)
        files = [f for f in lister(prefix) if f.is_load_file()]
        return sorted(files, key=lambda f: f.key)

    # DATE_AWARE
    if not start_date:
        raise ValueError(
            "start_date required in DATE_AWARE mode (cdc_operator.rs:116-118)"
        )
    start = parse_naive_utc(start_date)
    stop = parse_naive_utc(stop_date) if stop_date else None
    files = lister(prefix, date_start_key(s3_prefix, database, schema, table, start_date))
    files = filter_by_date_window(files, start, stop)
    return classify_and_order(files, strict_reference_mode=strict_reference_mode)
