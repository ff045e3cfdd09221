from .schedules import BetaSchedule, CapacitySchedule, lr_at  # noqa: F401
from .callbacks import EarlyStopping, CheckpointManager  # noqa: F401
from .optim import build_optimizer  # noqa: F401
from .loop import train, TrainState  # noqa: F401
