"""Dataflow plans — each reference "query" as a lazy DataFrame pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame


class SheetDict(dict):
    """Sheet-name → DataFrame mapping with the persisted root attached.

    ``analyze_mongo_log`` / ``analyze_mysql_log`` persist a shared
    parse root when ``cache=True``; callers that hold the sheet dict
    must be able to unpersist it later. Earlier rounds smuggled that
    root through a ``"_base"`` dict entry, which leaked into anything
    iterating ``items()`` (a generic sheet writer would emit a bogus
    sheet; tests collected the whole parse). The root now rides
    out-of-band as the ``base`` attribute: plain dict iteration sees
    display sheets only.
    """

    def __init__(self, sheets: dict[str, DataFrame], base: DataFrame | None = None):
        super().__init__(sheets)
        self.base = base

    def unpersist_base(self) -> None:
        if self.base is not None:
            try:
                self.base.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
