from .source import AcquisitionSource, SyntheticSource, VirtualOctSource  # noqa: F401
from .recorder import Recorder, RecordingParams, RecordingScheduler  # noqa: F401
