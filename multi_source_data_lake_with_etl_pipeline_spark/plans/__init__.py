"""Declarative pipeline layer (SURVEY.md §3.2)."""

from .lint import LintFinding, lint_plan  # noqa: F401
from .pipeline import ETLJob, TransformStep, run_job  # noqa: F401
from .scheduler import DagRun, Task, run_dag, topological_order  # noqa: F401
