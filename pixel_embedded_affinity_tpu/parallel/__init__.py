from .mesh import get_mesh, batch_sharding, replicated_sharding
from .tiling import TiledInference3D, gaussian_blend_weight
