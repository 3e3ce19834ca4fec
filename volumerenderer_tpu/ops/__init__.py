from . import camera, gather, intersect, lights, march, rng, scan
