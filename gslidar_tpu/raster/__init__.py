from gslidar_tpu.raster.settings import RasterSettings  # noqa: F401
from gslidar_tpu.raster.rasterize import rasterize  # noqa: F401
from gslidar_tpu.raster.preprocess import mark_visible  # noqa: F401
