from .state import TrainState, create_train_state  # noqa: F401
from . import steps, schedules  # noqa: F401
