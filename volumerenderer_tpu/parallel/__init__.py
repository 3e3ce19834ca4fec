from . import sharding
from .sharding import make_mesh, sharded_render_step
