from coastline.data.pipeline import DeviceDataset, IMAGENET_MEAN, IMAGENET_STD  # noqa: F401
from coastline.data.rasterize import mask_from_labelme, rasterize_polygons  # noqa: F401
