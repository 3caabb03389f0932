from .warp import grid_sample_pallas, pallas_warp_available
