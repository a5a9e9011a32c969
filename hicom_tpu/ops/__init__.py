from .resize import interpolate_linear, max_pool2d  # noqa: F401
from .pos_embed import get_3d_sincos_pos_embed  # noqa: F401
from .attention import multi_head_attention, sdpa  # noqa: F401
