"""Operator inventory (SURVEY.md §2) — importing this package registers
every implemented query in the registry."""

from . import (  # noqa: F401
    aggregates,
    bucketing,
    curation,
    dedup_scale,
    eventtime,
    funnels,
    graph,
    joins,
    lakehouse_ops,
    linkage,
    multimodal,
    reshape,
    scalars,
    scans,
    setops,
    sketches,
    text,
    textstats,
    timeseries,
    tpch_full,
    tpch_more,
    udfs,
    vectors,
    windows,
)
