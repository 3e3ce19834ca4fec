from . import sharding
from .sharding import MeshRenderer, make_mesh, sharded_render_step
