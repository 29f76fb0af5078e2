"""Quiet-run stamp shared by every perf-artifact producer (bench.py,
tools/scale_rehearsal.py, tools/incr_dedup_probe.py, tools/ingest_soak.py).

Round-7 lesson (SCALING.md "quiet runs"): rehearsal timings vary 2-5x per
query when anything else runs on the box — scd2 measured 21/50/9 s across
three x30 runs of identical code.  The protocol ("nothing else running") was
prose until now; this module makes every artifact STATE whether it was
honored, so a suspicious number can be adjudicated from the artifact alone
instead of re-diagnosing the query.

``quiet_stamp()`` samples, at call time:

- 1-minute load average (the whole-box signal — a concurrent pytest or a
  second rehearsal shows up here even when it is not a python process),
- the number of OTHER live python processes (the usual culprit: a plan
  report, a forgotten pytest, a second rehearsal),

and returns a dict with a ``quiet`` verdict: True iff no other python
process is live and the load average is under ``load_max`` (default 4.0 —
an idle 32-cpu box sits well under 1; a concurrent Spark job pushes past 10
within a minute).  Stamp ONCE at measurement start; the artifact key is
conventionally ``"quiet"``.
"""

from __future__ import annotations

import os


def _other_python_pids() -> list[int]:
    """Live python interpreter pids other than this process and its
    ancestors (the py4j-launched JVM is not python; pytest workers,
    concurrent tools, and stray drivers are)."""
    me = os.getpid()
    skip = {me}
    # walk own ancestry so `python tools/x.py` run from a python wrapper
    # does not flag its parent
    try:
        pid = me
        for _ in range(10):
            with open(f"/proc/{pid}/stat") as fh:
                pid = int(fh.read().split(")")[-1].split()[1])
            if pid <= 1:
                break
            skip.add(pid)
    except OSError:
        pass
    out = []
    for d in os.listdir("/proc"):
        if not d.isdigit() or int(d) in skip:
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as fh:
                argv0 = fh.read().split(b"\0", 1)[0].decode(errors="replace")
        except OSError:
            continue
        base = os.path.basename(argv0)
        if base.startswith("python"):
            out.append(int(d))
    return out


def quiet_stamp(load_max: float = 4.0) -> dict:
    """One measurement-start snapshot: {loadavg_1m, other_python_procs,
    quiet}.  Embed under the ``"quiet"`` key of every perf artifact."""
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    others = _other_python_pids()
    return {
        "loadavg_1m": load1,
        "other_python_procs": len(others),
        "quiet": bool(
            (load1 is None or load1 <= load_max) and not others
        ),
    }
