from .warp import grid_sample_pallas, pallas_warp_available
from .warp_gather import grid_sample_family
