"""Shared scaffold for the per-family oracle modules.

Every module in kdb_spark/oracles re-exports this surface (imports, the
epoch-µs constants, and `make_registry`) via a star import so the family
files read exactly like the sections of the old monolithic
__spark_entry__.py they were cut from. Definitions here must stay
import-light: this package is imported by the driver contract file.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kdb_spark.analytics import aggregations as agg
from kdb_spark.analytics import behavior as bh
from kdb_spark.analytics import joins as jn
from kdb_spark.analytics import kernel as kn
from kdb_spark.analytics import scalars as sc
from kdb_spark.analytics import setops as so
from kdb_spark.analytics import sorts as st
from kdb_spark.analytics import windows as wn
from kdb_spark import sources as src
from kdb_spark import streaming as sm
from kdb_spark.llm import curation as cu
from kdb_spark.llm import dedup as dd
from kdb_spark.llm import multimodal as mm
from kdb_spark.llm import similarity as sim
from kdb_spark.llm import textstats as tx
from kdb_spark.tables import DAY_US, HOUR_US, events_us, load

# epoch-µs constants (UTC), events span 2024-01-01 .. 2024-01-30
T_JAN10 = 1_704_844_800_000_000
T_JAN12 = 1_705_017_600_000_000
T_JAN17 = 1_705_449_600_000_000
NOW_JAN20 = 1_705_708_800_000_000
CUT_JAN08 = 1_704_672_000_000_000
MIN_PRICE = 300_000.0


def make_registry():
    """Per-module (QUERIES, ORACLES, _reg) triple: each family module
    registers into its OWN dicts; kdb_spark/oracles/__init__.py merges
    them in the frozen REG_ORDER so the driver-visible registration
    order is bit-identical to the pre-split monolith."""
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}

    def _reg(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
        queries[name] = fn
        if sql is not None:
            oracles[name] = sql

    return queries, oracles, _reg


__all__ = [
    "Callable", "DataFrame", "SparkSession", "F",
    "agg", "bh", "jn", "kn", "sc", "so", "st", "wn", "src", "sm",
    "cu", "dd", "mm", "sim", "tx",
    "DAY_US", "HOUR_US", "events_us", "load",
    "T_JAN10", "T_JAN12", "T_JAN17", "NOW_JAN20", "CUT_JAN08", "MIN_PRICE",
    "make_registry",
]
