from .checkpoint import save_checkpoint, restore_checkpoint, find_last_checkpoint
from .logging import MetricLogger, save_image_grid
