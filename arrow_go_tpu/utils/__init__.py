from .memwatch import DeviceMemoryWatcher, device_live_bytes  # noqa: F401
from .metrics import Metrics, metrics, trace  # noqa: F401
