"""Legacy SDE utilities namespace — the reference exposes the IR-SDE through
``utils.sde_utils`` (utils/__init__.py:1-4); the TPU implementation lives in
sde/ir_sde.py and the schedule helpers in sde/schedules.py."""

from ..sde.ir_sde import IRSDE  # noqa: F401
from ..sde.schedules import make_schedule, schedule_increment  # noqa: F401
