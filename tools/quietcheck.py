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
    """Live python interpreter pids that are NOT part of this process tree:
    not this process, not an ancestor (a python wrapper that launched us),
    and not a descendant (the pyspark.daemon/worker fleet our own session
    forks under the JVM — the first probe run counted 33 of those as
    'foreign').  What remains is genuinely concurrent work: a pytest, a
    second rehearsal, a stray driver."""
    me = os.getpid()
    ppid: dict[int, int] = {}
    python_pids: set[int] = set()
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        pid = int(d)
        try:
            with open(f"/proc/{d}/stat") as fh:
                ppid[pid] = int(fh.read().split(")")[-1].split()[1])
            with open(f"/proc/{d}/cmdline", "rb") as fh:
                argv0 = fh.read().split(b"\0", 1)[0].decode(errors="replace")
        except OSError:
            continue
        if os.path.basename(argv0).startswith("python"):
            python_pids.add(pid)

    def related(pid: int) -> bool:
        # ancestor of me, or descendant of me (walk pid's ancestry; if it
        # passes through me, it is ours)
        cur, seen = pid, 0
        while cur > 1 and seen < 64:
            if cur == me:
                return True
            cur = ppid.get(cur, 0)
            seen += 1
        # ancestors: walk me upward looking for pid
        cur, seen = me, 0
        while cur > 1 and seen < 64:
            if cur == pid:
                return True
            cur = ppid.get(cur, 0)
            seen += 1
        return False

    return [p for p in python_pids if not related(p)]


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


def settle(load_max: float = 4.0, timeout: float = 240.0,
           poll: float = 10.0) -> None:
    """Block until the 1-minute load average decays below ``load_max`` (or
    ``timeout`` elapses).  Call between a heavy setup phase (corpus
    synthesis, soak prep) and ``quiet_stamp()``: loadavg cannot tell OUR
    just-finished synthesis from foreign work, so without the settle the
    stamp reads non-quiet on runs that honored the protocol perfectly —
    the ×10 r8 rehearsal stamped loadavg 4.85 from its own synthesis."""
    import time

    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            if os.getloadavg()[0] <= load_max:
                return
        except OSError:
            return
        time.sleep(poll)
