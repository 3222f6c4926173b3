from .task_configs import task_parameters, SEM_CLASSES
from .synthetic import SyntheticMultiTaskDataset
from .loader import BatchLoader, prefetch_to_device
from .clevr import CLEVRDataset
from .prerender import PrerenderedDataset, prerender
from .device_cache import DeviceResidentDataset
