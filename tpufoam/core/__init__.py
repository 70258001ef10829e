from .grid import Grid2D, make_grid
from .geometry import (
    Cylinder,
    Rectangle,
    Triangle,
    Ellipse,
    InclinedPlate,
    channel_case_geometry,
)
from .interp import ResampleOp, build_resample, apply_resample
from .sdf import sdf_min_distance, domain_and_sdf
