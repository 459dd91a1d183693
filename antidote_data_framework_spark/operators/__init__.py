"""Operator inventory (SURVEY.md §2) — importing this package registers
every implemented query in the registry."""

from . import aggregates  # noqa: F401
