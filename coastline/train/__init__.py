from coastline.train.losses import bce_loss, cross_entropy_loss  # noqa: F401
from coastline.train.metrics import (  # noqa: F401
    aggregate_metrics,
    per_image_metrics,
)
from coastline.train.lr import PlateauState, plateau_init, plateau_update  # noqa: F401
