from .inspect import (
    codegen_stages,
    explain_str,
    plan_stats,
)

__all__ = ["codegen_stages", "explain_str", "plan_stats"]
