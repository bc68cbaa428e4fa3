"""Model layer (L5/L6): fused tendency API + drivers."""

from . import aida, box, calibration, column, emulator, p3_sandbox, parcel, tendencies
from .calibration import EKIResult, calibrate_abifm, eki_calibrate, uki_calibrate
from .p3_sandbox import P3SandboxState, run_p3_sandbox
from .column import ColumnState, step_column_1m
from .parcel import ParcelParams, ParcelState, parcel_params, run_parcel
from .tendencies import (
    SourceTerms1M,
    bulk_microphysics_tendencies,
    Tendencies1M,
    Tendencies2M,
    bulk_tendencies_0m,
    bulk_tendencies_1m,
    bulk_tendencies_2m,
)
