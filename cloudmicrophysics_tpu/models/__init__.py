"""Model layer (L5/L6): fused tendency API + drivers."""

from . import box, column, parcel, tendencies
from .column import ColumnState, step_column_1m
from .parcel import ParcelParams, ParcelState, parcel_params, run_parcel
from .tendencies import (
    SourceTerms1M,
    Tendencies1M,
    Tendencies2M,
    bulk_tendencies_0m,
    bulk_tendencies_1m,
    bulk_tendencies_2m,
)
