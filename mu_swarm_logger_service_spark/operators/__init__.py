"""Relational operators (SURVEY.md §2.1-2.7). Importing registers queries."""

from . import aggregates  # noqa: F401

_MODULES = ["aggregates"]

for _m in ("scans", "filters", "joins", "windows", "sorts", "setops",
           "analytics", "timeseries", "sketches"):
    try:  # modules land incrementally during the build
        __import__(f"{__name__}.{_m}")
        _MODULES.append(_m)
    except ImportError:
        pass
