"""Insert throttling config (SURVEY §2.6 X2).

Env-variable parity with the reference (postgres_operator_impl.rs:
26-34, 455-482): ``DELAYABLE_CONFIG`` (csv of ``db:schema:table``
keys), ``DELAY_INSERT`` (enable), ``INSERT_DELAY`` (ms, default 1000),
``ROWS_PER_DF`` (chunk size, default 10000).

In a distributed writer there is no driver-side sleep between chunks;
the equivalent control surface is (writer parallelism × batch size):
a throttled table writes through fewer JDBC connections with the
configured batch, which bounds rows/sec at the sink the same way the
reference's sleep does — without idling executors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ThrottleConfig:
    delayable: frozenset[str] = field(default_factory=frozenset)
    delay_enabled: bool = False
    insert_delay_ms: int = 1000  # reference default
    rows_per_df: int = 10_000  # reference ROWS_PER_DF default

    def applies_to(self, database: str, schema: str, table: str) -> bool:
        return (
            self.delay_enabled
            and f"{database}:{schema}:{table}" in self.delayable
        )

    def writer_partitions(self, default: int) -> int:
        """Throttled tables write through a single connection (the
        closest distributed analogue of sleep-per-chunk)."""
        return 1 if self.delay_enabled else default


def throttle_config_from_env(env: dict[str, str] | None = None) -> ThrottleConfig:
    e = env if env is not None else os.environ
    delayable = frozenset(
        k.strip() for k in e.get("DELAYABLE_CONFIG", "").split(",") if k.strip()
    )
    return ThrottleConfig(
        delayable=delayable,
        delay_enabled=e.get("DELAY_INSERT", "").lower() in ("1", "true", "yes"),
        insert_delay_ms=int(e.get("INSERT_DELAY", "1000")),
        rows_per_df=int(e.get("ROWS_PER_DF", "10000")),
    )
