from .upfirdn import setup_filter, upfirdn2d, filter2d, upsample2d, downsample2d
from .bias_act import bias_act, activation_funcs, apply_activation
from .resize import resize_bilinear, resize_bicubic, adaptive_avg_pool2d, resize_matrix
from .pixelshuffle import pixel_shuffle, pixel_unshuffle
from .groupnorm import group_norm
from .attention import dot_product_attention
