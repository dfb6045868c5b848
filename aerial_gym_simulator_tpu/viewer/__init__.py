from .offline_viewer import OfflineViewer
from .live_viewer import LiveViewer

__all__ = ["OfflineViewer", "LiveViewer"]
