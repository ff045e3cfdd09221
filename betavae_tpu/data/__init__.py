from .dataset import ArrayDataset, build_datasets, TUMOR_CLASSES  # noqa: F401
from .pipeline import DeviceData, BatchPlan  # noqa: F401
