"""Mesh-parallel DREAM pipeline (SURVEY.md §2.10, §5.8)."""
from .dist_mapper import MeshMapOut, build_mesh_dream_step
from .dream_mesh import MeshDreamMapper, mesh_dream_sam
from .mesh import make_mesh, mesh_factors
