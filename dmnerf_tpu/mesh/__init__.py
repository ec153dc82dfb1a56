from dmnerf_tpu.mesh.marching import marching_cubes, marching_tetrahedra
from dmnerf_tpu.mesh.ply import read_ply, write_ply

__all__ = ["marching_cubes", "marching_tetrahedra", "read_ply", "write_ply"]
