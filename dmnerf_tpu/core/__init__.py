from dmnerf_tpu.core.encoding import positional_encoding, encoding_dim
from dmnerf_tpu.core.rays import get_rays, pixel_grid
from dmnerf_tpu.core.sampling import z_val_sample, perturb_z_vals, sample_pdf
from dmnerf_tpu.core.rendering import composite, render_rays

__all__ = [
    "positional_encoding", "encoding_dim", "get_rays", "pixel_grid",
    "z_val_sample", "perturb_z_vals", "sample_pdf", "composite", "render_rays",
]
