from .occam import OccamAnalyzer

__all__ = ["OccamAnalyzer"]
