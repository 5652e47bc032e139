from dvren_tpu.ops.raygen import Rays, generate_rays
from dvren_tpu.ops.sampling import SampleLattice, generate_samples
from dvren_tpu.ops.integrate import Integration, compute_alpha, integrate
from dvren_tpu.ops.compose import ImagePlanes, compose

__all__ = [
    "Rays",
    "generate_rays",
    "SampleLattice",
    "generate_samples",
    "Integration",
    "compute_alpha",
    "integrate",
    "ImagePlanes",
    "compose",
]
