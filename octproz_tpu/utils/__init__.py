from .console import MessageConsole  # noqa: F401
from .settings import SettingsManager  # noqa: F401
from .deviceinfo import device_report  # noqa: F401
