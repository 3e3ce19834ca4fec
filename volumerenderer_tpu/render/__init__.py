from . import color, debug_views, density, path, photon
from .color import ViewCache, build_view, render_frame, shade_view
from .photon import LightArray
