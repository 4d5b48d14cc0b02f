from .metric_main import calc_metric, report_metric, register_metric, list_metrics
