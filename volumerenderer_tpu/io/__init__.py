from . import checkpoint, ppm
