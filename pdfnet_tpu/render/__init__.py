from pdfnet_tpu.render.rasterizer import rasterize_mesh, render_two_hands  # noqa: F401
from pdfnet_tpu.render.lighting import sh_illumination  # noqa: F401
