"""Logical planning for the estimator: the (g,t) cell-spec planner.

The planner lives with the estimator internals in
``csdid_pyspark_spark.did.cells``; this package re-exports it as the
engine's planning surface (cell enumeration is the one piece of
"query planning" the DiD workload needs — everything downstream is
declarative DataFrame lineage handed to Catalyst).
"""

from csdid_pyspark_spark.did.cells import (
    CellSpec,
    build_cell_specs,
    build_cell_table_panel,
    build_cell_table_rc,
    control_pred,
    spec_df,
)

__all__ = [
    "CellSpec",
    "build_cell_specs",
    "build_cell_table_panel",
    "build_cell_table_rc",
    "control_pred",
    "spec_df",
]
