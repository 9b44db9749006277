from onet_tpu.preprocess.haze import (
    dark_channel, atm_light, transmission_estimate, guided_filter,
    transmission_refine, recover, dehaze, haze_radiance,
)
from onet_tpu.preprocess.image import (
    equalize_uint8, contrast_enhance, rgb_resize_smaller_edge,
    thumbnail_rgb, PRE_OPTIONS, apply_pre_option,
)
