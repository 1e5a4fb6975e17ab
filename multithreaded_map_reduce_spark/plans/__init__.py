from .audit import explain_formatted, plan_report, assert_plan

__all__ = ["explain_formatted", "plan_report", "assert_plan"]
