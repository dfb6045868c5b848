from .offline_viewer import OfflineViewer

__all__ = ["OfflineViewer"]
