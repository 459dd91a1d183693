"""Operator inventory (SURVEY.md §2) — importing this package registers
every implemented query in the registry."""

from . import aggregates, joins, scalars, scans, setops  # noqa: F401
