from .panorama import RenderConfig, RenderContext, render_frame  # noqa: F401
from .pole import combine_bottom_images_with_pole_removal  # noqa: F401
