"""Phase-DAG pipeline driver: the daily-load entry point done right.

The reference's production driver (reference daily_load.py:42-54) runs
10 sequential phases through a ``run_phase`` wrapper that captures
timing and errors — but on failure it CONTINUES, so downstream phases
run against partially-stale upstream data (its documented flaw;
SURVEY.md §3 EP1). This driver keeps the per-phase metrics and fixes
the flaw: a phase whose dependency failed (or was skipped) is SKIPPED
and recorded as such, never run on stale inputs.

Deliberately tiny and engine-agnostic: phases are callables over a
shared context (usually closing over a SparkSession); dependencies are
explicit; execution order is a deterministic topological sort (stable:
declaration order breaks ties). Per-phase results — status, wall
seconds, rows (whatever the phase returns), error, blocked_by — form
the run report, the lineage analog of the reference's phase timing log
(guia-daily-load.md:104-110).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Phase:
    name: str
    fn: Callable[[], object]
    deps: list[str] = field(default_factory=list)


class PipelineError(ValueError):
    pass


def _toposort(phases: list[Phase]) -> list[Phase]:
    by_name = {p.name: p for p in phases}
    if len(by_name) != len(phases):
        raise PipelineError("duplicate phase names")
    for p in phases:
        for d in p.deps:
            if d not in by_name:
                raise PipelineError(f"phase {p.name!r} depends on unknown phase {d!r}")
    done: list[Phase] = []
    done_names: set[str] = set()
    visiting: set[str] = set()

    def visit(p: Phase) -> None:
        if p.name in done_names:
            return
        if p.name in visiting:
            raise PipelineError(f"dependency cycle through {p.name!r}")
        visiting.add(p.name)
        for d in p.deps:
            visit(by_name[d])
        visiting.discard(p.name)
        done_names.add(p.name)
        done.append(p)

    for p in phases:  # declaration order = stable tiebreak
        visit(p)
    return done


def run_pipeline(
    phases: list[Phase], *, fail_fast: bool = False
) -> dict[str, dict]:
    """Run the DAG. Returns {phase: report} where report has
    ``status`` ('ok' | 'failed' | 'skipped_upstream'), ``seconds``,
    ``result`` (the phase's return value), ``error`` and
    ``blocked_by``. Independent branches keep running after a failure
    (unless ``fail_fast``); dependents of a failure never do."""
    report: dict[str, dict] = {}
    for p in _toposort(phases):
        bad = [d for d in p.deps if report[d]["status"] != "ok"]
        if bad:
            report[p.name] = {
                "status": "skipped_upstream",
                "seconds": 0.0,
                "result": None,
                "error": None,
                "blocked_by": bad,
            }
            continue
        t0 = time.perf_counter()
        try:
            result = p.fn()
            report[p.name] = {
                "status": "ok",
                "seconds": round(time.perf_counter() - t0, 3),
                "result": result,
                "error": None,
                "blocked_by": [],
            }
        except Exception as exc:  # noqa: BLE001 - the report IS the handler
            report[p.name] = {
                "status": "failed",
                "seconds": round(time.perf_counter() - t0, 3),
                "result": None,
                "error": f"{type(exc).__name__}: {exc}",
                "blocked_by": [],
            }
            if fail_fast:
                for rest in _toposort(phases):
                    if rest.name not in report:
                        report[rest.name] = {
                            "status": "skipped_upstream",
                            "seconds": 0.0,
                            "result": None,
                            "error": None,
                            "blocked_by": [p.name],
                        }
                break
    return report


def failed(report: dict[str, dict]) -> list[str]:
    return [n for n, r in report.items() if r["status"] == "failed"]
