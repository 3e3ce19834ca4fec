from . import color, density, path, photon
from .photon import LightArray
