from .api import RasterSettings, rasterize  # noqa: F401
