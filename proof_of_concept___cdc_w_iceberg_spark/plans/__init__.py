from .explain import explain_str, plan_report  # noqa: F401
