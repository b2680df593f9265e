from .api import RasterSettings, grow_bucket, rasterize  # noqa: F401
