"""Training CLI: `python -m dmnerf_tpu.cli.train --config configs/dmsr/train/study.txt`

Replaces the reference's three near-identical entry scripts
(train_{dmsr,replica,scannet}.py) with one: the dataset is selected from
--datadir and the sampler (full vs 30%-labeled crop) follows the dataset.
"""

from __future__ import annotations

from dmnerf_tpu.config import initial
from dmnerf_tpu.data.base import load_dataset
from dmnerf_tpu.parallel.mesh import make_mesh

import jax


def main(argv=None):
    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = initial(argv)
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    args.is_train = True
    scene = load_dataset(args)
    print(f"Loaded {args.datadir}: {len(scene.images)} images "
          f"{scene.H}x{scene.W}, ins_num={scene.ins_num}")

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(getattr(args, "data_devices", 0))
        print(f"data-parallel over {mesh.devices.size} devices")

    from dmnerf_tpu.train.loop import train
    train(args, scene, mesh=mesh)


if __name__ == "__main__":
    main()
