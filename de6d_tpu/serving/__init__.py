from .streaming import StreamingDetector

__all__ = ["StreamingDetector"]
