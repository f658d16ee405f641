from movement_spark.plans.audit import (
    explain_text, has_pushed_filters, plan_audit, whole_stage_codegen_spans,
)

__all__ = [
    "explain_text",
    "has_pushed_filters",
    "plan_audit",
    "whole_stage_codegen_spans",
]
