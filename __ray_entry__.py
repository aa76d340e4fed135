"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init`` / ``ray.shutdown``. Implementations live in
``merge_machine_ray.pipelines.queries`` (operator queries + DuckDB
oracle SQL twins) and ``merge_machine_ray.pipelines.entity_resolution``
(the flagship blocking → scoring → clustering pipeline).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship ER pipeline on sf0.001: pages-style resolution over the
    documents table (doc_id/text/lang) → (doc_id, cluster_id)."""
    from merge_machine_ray.pipelines.queries import er_documents_full

    return er_documents_full("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from merge_machine_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from merge_machine_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
