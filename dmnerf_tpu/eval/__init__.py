from dmnerf_tpu.eval.metrics import psnr, ssim
from dmnerf_tpu.eval.instance_ap import ins_eval, calculate_ap
from dmnerf_tpu.eval.renderer import make_chunk_renderer, render_image

__all__ = ["psnr", "ssim", "ins_eval", "calculate_ap",
           "make_chunk_renderer", "render_image"]
