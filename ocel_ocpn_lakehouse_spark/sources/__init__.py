"""Sources (SURVEY §2.1): engine-table scan lives in core.table; this
package adds the external-format loaders the reference ships."""

from .ocel_json import load_ocel_json

__all__ = ["load_ocel_json"]
