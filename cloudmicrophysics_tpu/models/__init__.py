"""Model layer (L5/L6): fused tendency API + drivers."""

from . import column, tendencies
from .column import ColumnState, step_column_1m
from .tendencies import (
    SourceTerms1M,
    Tendencies1M,
    bulk_tendencies_0m,
    bulk_tendencies_1m,
)
