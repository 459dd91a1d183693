"""Operator inventory (SURVEY.md §2) — importing this package registers
every implemented query in the registry."""

from . import (  # noqa: F401
    aggregates,
    eventtime,
    joins,
    scalars,
    scans,
    setops,
    text,
    vectors,
    windows,
)
