from gdn_tpu.ops.ssim import gaussian_window, ssim
from gdn_tpu.ops.resize import resize_bilinear, resize_nearest
