from .remap import (  # noqa: F401
    remap,
    remap_bilinear,
    remap_bicubic,
    remap_static_banded,
)
from .resize import resize_bilinear, resize_area, gaussian_blur, pyramid_down  # noqa: F401
from .filters import iir_lowpass_2d, sharpen_iir, median_filter  # noqa: F401
from .compositing import (  # noqa: F401
    feather_alpha,
    flatten_layers_alpha_softmax,
    flatten_layers_deghost_prefer_base,
    offset_horizontal_wrap,
    stack_horizontal,
    stack_vertical,
)
