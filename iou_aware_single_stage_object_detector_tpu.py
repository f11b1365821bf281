"""Alias module: the framework's import name is ``ioudet``.

``import iou_aware_single_stage_object_detector_tpu as ioudet`` also works
for discoverability (the project rebuilds
ShengkaiWu/IoU-aware-single-stage-object-detector TPU-natively).
"""

from ioudet import *  # noqa: F401,F403
from ioudet import (apis, core, data, models, ops, parallel, utils,  # noqa: F401
                    __version__)
