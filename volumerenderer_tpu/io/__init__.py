from . import checkpoint, frame_writer, ppm
