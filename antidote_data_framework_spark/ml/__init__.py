"""Recsys / antidote / ML operators — the reference-parity surface
(SURVEY.md §2A) plus the MLlib-backed scale twins."""

from . import als, als_custom, antidote, conformal, glm, lsh, negatives, neighbors_cf, pca, pq, ranking, recsys  # noqa: F401
