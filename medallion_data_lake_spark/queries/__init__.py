"""Named query registry — the engine's public query surface.

Every operator capability from SURVEY.md §2 (plus the north-star dedup /
similarity / text / multimodal operators) is exposed as a named query:
a PySpark builder ``(spark, sf_dir) -> DataFrame`` and, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string computing the
same result on the same parquet tables. The driver's correctness gate
compares the two (row count + schema + order-insensitive value hash).

Parity rules applied throughout (SURVEY.md §7.4):
- every computed column is aliased identically in both engines;
- money/double aggregates are rounded (summation order must not flip the
  hash);
- collections are sorted before joining (deterministic GROUP_CONCAT);
- top-k queries always carry a unique tiebreak key in the sort;
- cross-engine hashing goes through md5 (functions.md5_int).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One named engine capability.

    ``oracle`` is DuckDB SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events
    documents embeddings); ``None`` marks a genuinely
    non-SQL-expressible operator (driver runs a rows-only check).
    ``doc`` lists the SURVEY.md §2 operator IDs covered.
    """

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


def query(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a builder function under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        register(QuerySpec(name=name, build=fn, oracle=oracle, doc=doc, tags=tags))
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module and return the populated registry."""
    from . import core  # noqa: F401
    from . import core2  # noqa: F401
    from . import dedup  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import similarity  # noqa: F401
    from . import streamlike  # noqa: F401
    from . import text  # noqa: F401

    return REGISTRY
