"""JVM-side column-expression helpers (whole-stage-codegen friendly)."""

from .cells_sql import cell_sql_expr, cell_col, parent_cell_col  # noqa: F401
