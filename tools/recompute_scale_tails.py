#!/usr/bin/env python
"""Re-derive a SCALE artifact's consecutive-point tail fields.

The tail-exponent gate in tools/scale_rehearsal.py compares an artifact's
measured xN timings against the COMMITTED artifact at the largest smaller
factor at run time.  When that smaller-factor artifact is later found to
be polluted and re-measured (round 8: the first ×10 run carried three
noise-flagged entries AND several implausibly-low readings the ×30 run
exposed — order_priority_check 8.26 s at ×10 vs 1.53 s at ×30), the
larger artifact's `local_exponents` / `tail_superlinear` / verdict are
stale derivations from bad inputs.  This tool recomputes ONLY those
derived fields from the artifact's own measured `queries` (untouched)
against the current committed smaller-factor artifact — exactly the
formula the rehearsal uses (α = log(tN/tM)/log(N/M), ALPHA_MAX /
KNOWN_SUPERLINEAR_TAIL envelopes, sub-2 s entries skipped).

Usage: python tools/recompute_scale_tails.py SCALE_X30.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_rehearsal import (  # noqa: E402
    ALPHA_MAX, KNOWN_SUPERLINEAR_TAIL, local_alpha,
)


def recompute(path: str) -> dict:
    with open(path) as fh:
        art = json.load(fh)
    factor = art["factor"]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = None
    for f in sorted(os.listdir(repo_root)):
        if f.startswith("SCALE_X") and f.endswith(".json"):
            try:
                with open(os.path.join(repo_root, f)) as fh:
                    cand = json.load(fh)
            except (OSError, ValueError):
                continue
            m = cand.get("factor")
            if isinstance(m, int) and m < factor and (
                prev is None or m > prev["factor"]
            ):
                prev = cand

    local_exponents: dict[str, dict] = {}
    tail_superlinear: list[str] = []
    if prev is not None:
        for q, v in art["queries"].items():
            pv = prev.get("queries", {}).get(q)
            if not pv or not pv.get("xn_sec") or not v.get("xn_sec"):
                continue
            alpha = local_alpha(
                v["xn_sec"], pv["xn_sec"], factor, prev["factor"]
            )
            env = KNOWN_SUPERLINEAR_TAIL.get(q)
            entry = {
                "from_factor": prev["factor"],
                "alpha_local": alpha,
                "alpha_max": env["alpha_max"] if env else ALPHA_MAX,
                **({"documented_cause": env["cause"]} if env else {}),
            }
            local_exponents[q] = entry
            if alpha > entry["alpha_max"]:
                tail_superlinear.append(q)
        tail_superlinear.sort()

    art["local_exponents"] = local_exponents
    art["tail_superlinear"] = tail_superlinear
    superlinear = art.get("superlinear", [])
    quadratic_over = art.get("expected_quadratic_over_envelope", [])
    art["verdict"] = (
        "PASS: no query exceeds the x%d wall-clock envelope" % factor
        + (
            " (quadratic-output exact path over it as designed: %s)"
            % ", ".join(quadratic_over) if quadratic_over else ""
        )
        if not (superlinear or tail_superlinear)
        else "ATTENTION: "
        + "; ".join(
            s for s in (
                "super-linear queries need a plan diff: %s"
                % ", ".join(superlinear) if superlinear else "",
                "tail bend (consecutive-point exponent over envelope): %s"
                % ", ".join(tail_superlinear) if tail_superlinear else "",
            ) if s
        )
    )
    art["tails_recomputed_against"] = (
        {"factor": prev["factor"]} if prev else None
    )
    with open(path, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    return art


if __name__ == "__main__":
    for p in sys.argv[1:]:
        a = recompute(p)
        print(p, "->", a["verdict"])
