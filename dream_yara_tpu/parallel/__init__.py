from .mesh import make_mesh, mesh_factors
from .dist_mapper import dist_map_step, DistMapOut
