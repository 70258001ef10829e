from .metrics import error_metrics, ErrorReport
