from .classification import confusion, metrics
from .report import format_results, show_results

__all__ = ["confusion", "metrics", "format_results", "show_results"]
