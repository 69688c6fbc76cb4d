from .cost import (
    DEFAULT_COST_MODEL,
    cost_expr,
    cost_optimization_report,
    event_cost_breakdown,
    hourly_cost_profile,
    resource_cost_profile,
    roi_metrics,
)

__all__ = [
    "DEFAULT_COST_MODEL",
    "cost_expr",
    "event_cost_breakdown",
    "hourly_cost_profile",
    "resource_cost_profile",
    "roi_metrics",
    "cost_optimization_report",
]
