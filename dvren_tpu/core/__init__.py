from dvren_tpu.core.status import Status, StatusCode, DvrenError, check
from dvren_tpu.core.context import Context, ContextOptions
from dvren_tpu.core.plan import (
    CameraConfig,
    CameraModel,
    InterpMode,
    OobPolicy,
    Plan,
    PlanConfig,
    Roi,
    SamplingConfig,
    SamplingMode,
)

__all__ = [
    "Status",
    "StatusCode",
    "DvrenError",
    "check",
    "Context",
    "ContextOptions",
    "CameraConfig",
    "CameraModel",
    "InterpMode",
    "OobPolicy",
    "Plan",
    "PlanConfig",
    "Roi",
    "SamplingConfig",
    "SamplingMode",
]
