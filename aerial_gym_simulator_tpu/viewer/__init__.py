from .offline_viewer import OfflineViewer
from .live_viewer import LiveViewer
from .web_viewer import WebViewer

__all__ = ["OfflineViewer", "LiveViewer", "WebViewer"]
