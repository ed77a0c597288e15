"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in raygraph) calls ``ray.init``/``ray.shutdown``.

- ``entry()``            flagship pipeline on sf0.001 (lineitem -> g1 edge
                         table -> PageRank scores)
- ``queries()``          one callable per implemented operator/pipeline
                         from SURVEY.md §2 (+ the training-data operators)
- ``oracle_sql()``       matching DuckDB SQL; omitted for sketch-based /
                         heuristic / approximate ops (rows-only check)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from raygraph.pipelines import entry_pipeline

    return entry_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from raygraph.pipelines import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raygraph.pipelines import ORACLES

    return dict(ORACLES)
