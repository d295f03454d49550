"""Driver-side pipeline runner — the Step Function replacement.

The reference orchestrates DeleteTrigger -> Crawler -> poll -> ETL ->
warehouse SQL -> poll via AWS Step Functions (infrastructure/
main.tf:341-511). In-engine, every stage is a synchronous Python call
in one SparkSession, so the runner is deliberately simple: named
steps, run in order, each timed, each idempotent (all engine writers
are mode=overwrite — L5's contract), with a manifest of results
instead of ``job.commit()`` (L4).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from collections.abc import Callable
from typing import Any


@dataclass
class Step:
    name: str
    fn: Callable[[dict[str, Any]], Any]
    """fn(context) -> result; result is stored in context[name]."""


@dataclass
class Pipeline:
    steps: list[Step]
    context: dict[str, Any] = field(default_factory=dict)

    def run(self) -> dict[str, Any]:
        """Run all steps in order; returns the context including a
        ``__manifest__`` of per-step wall-clock + status. A failing
        step aborts (fail-fast, like the SFN Fail state); reruns are
        safe because every write is overwrite-idempotent."""
        manifest = []
        for step in self.steps:
            t0 = time.perf_counter()
            try:
                self.context[step.name] = step.fn(self.context)
                status = "ok"
            except Exception:
                manifest.append(
                    {"step": step.name, "status": "failed", "sec": round(time.perf_counter() - t0, 3)}
                )
                self.context["__manifest__"] = manifest
                raise
            manifest.append(
                {"step": step.name, "status": status, "sec": round(time.perf_counter() - t0, 3)}
            )
        self.context["__manifest__"] = manifest
        return self.context
