from .snapshots import SnapshotInterval, epoch_schedule, index_schedule
from .superstep import SuperstepDriver

__all__ = ["SnapshotInterval", "epoch_schedule", "index_schedule", "SuperstepDriver"]
