"""dmnerf_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of DM-NeRF.

DM-NeRF learns, alongside density+RGB, a per-point object code (instance logits)
so a scene decomposes into objects. This package provides:

- core:      ray generation, stratified + inverse-CDF sampling, positional encoding,
             volume rendering (alpha compositing) — the coarse→fine pipeline.
- models:    the DM-NeRF field MLP (density + view-dep RGB + detached instance head).
- ops:       in-graph Hungarian assignment (LAP), Pallas fused field kernels.
- losses:    photometric MSE, Hungarian-matched instance loss (BCE + soft-IoU),
             3D emptiness penalizer.
- train:     jit/shard_map train step, LR schedule, orbax checkpointing, train loop.
- eval:      PSNR/SSIM/LPIPS metrics, instance AP (COCO-style), tiled renderer,
             test harness writing test_results.txt / matching_log.json.
- edit:      render-time scene manipulation (translate/rotate/scale/multi/deform).
- mesh:      density-grid query, marching cubes, per-object vertex coloring, PLY IO.
- data:      DM-SR / Replica / ScanNet / DM-SR-manipulation loaders + ScanNet
             preprocessing + a tiny synthetic scene for tests.
- parallel:  device-mesh/sharding helpers (data-parallel over the ray axis).

Reference behavior: vLAR-group/DM-NeRF (see SURVEY.md). The implementation here is
an independent TPU-first redesign, not a port.
"""

__version__ = "0.1.0"
