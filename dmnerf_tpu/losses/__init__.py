from dmnerf_tpu.losses.photometric import img2mse, mse2psnr
from dmnerf_tpu.losses.instance import ins_criterion, build_gt_onehot
from dmnerf_tpu.losses.emptiness import ins_penalizer

__all__ = ["img2mse", "mse2psnr", "ins_criterion", "build_gt_onehot", "ins_penalizer"]
