"""CheckPlan compilation + execution (verdicts / violations sinks)."""
