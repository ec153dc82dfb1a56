from dmnerf_tpu.ops.lap import lap_square

__all__ = ["lap_square"]
