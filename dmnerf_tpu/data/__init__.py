from dmnerf_tpu.data.base import SceneData, load_dataset

__all__ = ["SceneData", "load_dataset"]
