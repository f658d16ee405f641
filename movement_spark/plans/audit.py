"""Physical-plan audit helpers.

The build rule for every operator: after it is correct, read the plan
and iterate until it is the plan you'd want at 100 TB — filters pushed
to the scan, columns pruned, small sides broadcast, wide codegen spans,
no accidental Python. These helpers make those properties assertable in
tests instead of eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer = wider fused stages).
    AQE-era formatted plans mark them as ``[codegen id : N]``."""
    txt = explain_text(df)
    ids = set(re.findall(r"\[codegen id : (\d+)\]", txt))
    if ids:
        return len(ids)
    return len(re.findall(r"WholeStageCodegen", explain_text(df, "simple")))


def has_pushed_filters(df: DataFrame) -> bool:
    txt = explain_text(df)
    return "PushedFilters: [" in txt and "PushedFilters: []" not in txt


def plan_audit(df: DataFrame) -> dict:
    """Plan health summary for a DataFrame."""
    txt = explain_text(df)
    return {
        "broadcast_joins": txt.count("BroadcastHashJoin"),
        "sort_merge_joins": txt.count("SortMergeJoin"),
        "shuffles": txt.count("Exchange"),
        "python_stages": (txt.count("BatchEvalPython")
                          + txt.count("ArrowEvalPython")
                          + txt.count("FlatMapGroupsInPandas")
                          + txt.count("MapInPandas")),
        "pushed_filters": has_pushed_filters(df),
        "codegen_spans": whole_stage_codegen_spans(df),
        "scan_schemas": re.findall(r"ReadSchema: (\S+)", txt)[:4],
    }
