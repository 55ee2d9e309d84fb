from .analytics import run_analytics

__all__ = ["run_analytics"]
