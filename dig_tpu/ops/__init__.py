from dig_tpu.ops.attention import multi_head_attention
from dig_tpu.ops.patchify import patchify, unpatchify, mim_pixel_targets
