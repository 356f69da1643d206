"""Proof ledger: per-entry latest driver-correctness round, computed from
CORRECTNESS_r*.json — the input to each round's _DRIVER_PRIORITY rotation
(CLAUDE.md "Driver correctness gate"). Prints:

- entries never driver-graded (highest priority next round),
- the staleness histogram (latest proof round -> count),
- the oldest-proof entries in catalog order (the re-proof queue),
- rows-only entries and their last refresh.

Usage:
    python tools/proof_ledger.py [--assume-next-green] [--check-prefix]

--assume-next-green treats the CURRENT first-50 prefix as already proven
in round N+1 (what the ledger looks like if the staged prefix goes green)
— the view to use when staging the round AFTER next.

--check-prefix audits the CURRENT first-50 prefix against the ledger:
every never-driver-graded entry MUST be in it (exit 1 otherwise — there
is never a reason to leave an ungraded entry out), and every entry
OLDER than the prefix's freshest member that was left out is listed for
conscious confirmation (deferrals are legitimate — bench/entry()-covered
entries, code-changed jumps — but must be deliberate, not missed).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from collections import Counter

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assume-next-green", action="store_true")
    ap.add_argument("--check-prefix", action="store_true")
    ap.add_argument(
        "--defer",
        default="",
        help="comma-separated never-graded entries DELIBERATELY left out "
        "of the prefix (e.g. a verdict froze the prefix before the entry "
        "landed — r8: spatial_join_hot_cell); listed, not failed",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry

    qs = list(entry.queries())
    oracles = entry.oracle_sql()

    latest: dict[str, int] = {}
    rounds = []
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        rounds.append(rnd)
        for k, row in json.load(open(f)).items():
            # a graded row counts as a proof whether hash- or rows-only;
            # FAILED rows count too (the failure was seen and fixed — the
            # fix outranks re-proofs via the code-change rule instead)
            latest[k] = rnd
    cur = max(rounds) if rounds else 0
    # --check-prefix must audit the prefix against the REAL ledger even
    # when --assume-next-green mutates the working copy (r7 ADVICE: the
    # mutated view inflates freshest_in and mislabels every out-of-prefix
    # entry as deferred-older).
    graded = dict(latest)
    if args.assume_next_green:
        for k in qs[:50]:
            latest[k] = cur + 1

    never = [n for n in qs if n not in latest]
    hist = Counter(latest[n] for n in qs if n in latest)
    print(f"catalog: {len(qs)} entries, {len(oracles)} oracles")
    print(f"graded rounds seen: {rounds}")
    print(f"never driver-graded ({len(never)}): {never}")
    print("staleness histogram:", dict(sorted(hist.items())))

    oldest = sorted((n for n in qs if n in latest), key=lambda n: latest[n])
    print("\nre-proof queue (oldest first):")
    for n in oldest:
        if latest[n] >= cur + (1 if args.assume_next_green else 0):
            break
        tag = "" if n in oracles else "  [rows-only]"
        print(f"  r{latest[n]}  {n}{tag}")

    if args.check_prefix:
        prefix = set(qs[:50])
        deferred_new = {n.strip() for n in args.defer.split(",") if n.strip()}
        never_graded = [n for n in qs if n not in graded]
        # a misspelled or stale --defer name is otherwise silently ignored
        # (safe — the real entry still fails the check — but the typo
        # itself should be surfaced, and stale names from prior rounds
        # should not linger in scripts)
        unknown_defer = sorted(deferred_new - set(qs))
        # --defer has two legitimate uses: (a) never-graded entries that
        # landed after a verdict froze the prefix, (b) acknowledging an
        # OLDEST-staleness omission (the r14 ADVICE contradiction: those
        # names are graded, so the stale-defer WARN used to fire on the
        # very acknowledgment the oldest-staleness WARN asks for). Only
        # graded names NOT in the oldest bucket are stale defers.
        oldest_round = min((graded[n] for n in qs if n in graded), default=0)
        stale_defer = sorted(
            n
            for n in deferred_new & set(qs)
            if n in graded and graded[n] != oldest_round
        )
        if unknown_defer:
            print(f"WARN: --defer names not in the catalog: {unknown_defer}")
        if stale_defer:
            print(
                "WARN: --defer names already driver-graded (stale defer): "
                f"{stale_defer}"
            )
        missing_never = [
            n for n in never_graded if n not in prefix and n not in deferred_new
        ]
        acknowledged = [n for n in never_graded if n in deferred_new]
        if acknowledged:
            print(
                "never-graded but deliberately deferred (--defer): "
                f"{acknowledged}"
            )
        freshest_in = max((graded[n] for n in qs[:50] if n in graded), default=0)
        deferred = [
            (graded[n], n)
            for n in qs[50:]
            if n in graded and graded[n] < freshest_in
        ]
        # oldest-staleness omissions get their OWN loud warning (r13
        # VERDICT #1: revenue_share_window — the third remaining r8-proven
        # entry — was silently left out of a staged prefix; it appeared in
        # the generic deferred-older list below but that list is routinely
        # long and was missed. The oldest bucket should be empty outside
        # the prefix unless each member is a deliberate --defer.)
        oldest_out = [
            n
            for n in qs[50:]
            if graded.get(n) == oldest_round and n not in deferred_new
        ]
        if oldest_out:
            print(
                f"WARN: OLDEST-staleness (r{oldest_round}) entries OUTSIDE "
                f"the prefix — the rotation's next-up group; confirm each "
                f"deliberately or re-stage: {oldest_out}"
            )
        print(f"\nprefix check: freshest prefix member proof = r{freshest_in}")
        if deferred:
            print("deferred-older entries (confirm each is deliberate):")
            for rnd, n in sorted(deferred):
                print(f"  r{rnd}  {n}")
        else:
            print("no entry older than the prefix's freshest member is left out")
        if missing_never:
            print(f"FAIL: never-graded entries outside the prefix: {missing_never}")
            sys.exit(1)
        print("OK: all never-graded entries are in the prefix")


if __name__ == "__main__":
    main()
