"""User-pluggable clustering constraints (reference: ``cluster.py:
30-83`` ``Constraints`` object, defaults ``default_constraints.py``).

Four hooks, same contracts as the reference:

* ``get_columns_used() -> "all" | dict[col, dtype]`` — which all-names
  columns the constraint logic needs (``default_constraints.py:66-78``;
  dtype ``"date"`` is converted like the reference's dtype map,
  ``cluster.py:590-598``).
* ``is_valid_link(links_df) -> bool | bool Series`` — vectorized edge
  veto over a pandas frame with ``record_id_1/2, phat`` and the used
  columns as ``_1``/``_2`` pairs (``default_constraints.py:5-23``).
  Applied DISTRIBUTED via ``mapInPandas`` before connected components
  (the reference filters its potential-edges table up front,
  ``cluster.py:496-498``).
* ``is_valid_cluster(cluster_df, phat) -> bool`` — veto a proposed
  merged cluster, given the all-names rows of its members
  (``default_constraints.py:26-39``).  Runs inside the per-component
  greedy replay.
* ``apply_link_priority(valid_links_df) -> DataFrame`` — reorder edges
  before the greedy loop (``default_constraints.py:42-62``; default =
  phat desc, original_order asc).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd


def default_is_valid_link(links_df: pd.DataFrame):
    """Reference default: every link is valid
    (``default_constraints.py:5-23``)."""
    return True


def default_is_valid_cluster(cluster_df: pd.DataFrame,
                             phat: float) -> bool:
    """Reference default: every cluster is valid
    (``default_constraints.py:26-39``)."""
    return True


def default_apply_link_priority(valid_links_df: pd.DataFrame
                                ) -> pd.DataFrame:
    """Reference default order: phat desc, original_order asc
    (``default_constraints.py:42-62``)."""
    return valid_links_df.sort_values(
        by=["phat", "original_order"], ascending=[False, True])


def default_get_columns_used():
    """Reference default: all columns (``default_constraints.py:66-78``).
    The engine narrows this to the columns it needs for the auto
    constraints when the user doesn't override."""
    return "all"


@dataclass
class Constraints:
    get_columns_used: Callable[[], object] = default_get_columns_used
    is_valid_link: Callable[[pd.DataFrame], object] = \
        field(default=default_is_valid_link)
    is_valid_cluster: Callable[[pd.DataFrame, float], bool] = \
        field(default=default_is_valid_cluster)
    apply_link_priority: Callable[[pd.DataFrame], pd.DataFrame] = \
        field(default=default_apply_link_priority)

    def columns_used(self, all_columns: list[str]) -> list[str]:
        """Resolve get_columns_used against the all-names schema."""
        spec = self.get_columns_used()
        if spec == "all":
            return [c for c in all_columns
                    if c not in ("record_id",)]
        return [c for c in spec if c in all_columns]
