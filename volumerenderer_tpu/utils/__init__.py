from . import profiling, ssim, timing
