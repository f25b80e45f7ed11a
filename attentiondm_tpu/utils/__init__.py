from .images import save_image, save_image_grid
from .metrics_log import MetricsLogger, AverageMeter

__all__ = ["save_image", "save_image_grid", "MetricsLogger", "AverageMeter"]
