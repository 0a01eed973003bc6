"""Certification ledger: (query -> rounds certified -> seat/queue status),
derived from the ``CORRECTNESS_r*.json`` history instead of hand-grown
prose comments (VERDICT r7 item 7).

A query is *certified in round N* iff its row in ``CORRECTNESS_rN.json``
has rows_match AND schema_match AND hash_match all true. Status given the
current ``PRIORITY_WINDOW``:

- ``seated``     — in the driver window this round
- ``queued``     — oracled, 0 or 1 certifications, NOT seated (owed a row)
- ``certified``  — >= 2 certifications, rotated out (parity still enforced
                   locally by tools/check_parity.py over the FULL registry)
- ``rows-only``  — registered without a DuckDB oracle (weaker driver check)

Second-certification priority for queued entries (VERDICT r7 item 8):
approximation/bound-certified oracles first — their cross-engine contract
is structurally riskier than exact duals — then everything else in
registry order. The constant below pins that order; ``queue`` output is
sorted by it.

Usage:
    python tools/ledger.py            # table + queue to stdout
    python tools/ledger.py --propose-window [N]
        # emit the next N-seat PRIORITY_WINDOW + EXPECTED_QUEUE as
        # copy-pasteable Python (VERDICT r8 item 7) — rotation becomes a
        # tool output, not comment surgery.
    (tests import build_ledger/statuses and assert window invariants)

``build_ledger(max_round=...)`` caps the scan at a round so the seating
invariants can be evaluated against rotation-time data even after the
driver drops a newer ``CORRECTNESS_r{N}.json`` mid-round (ADVICE r8:
without the cap, the no-wasted-seats invariant goes red the moment the
current round's results land and every seated query gains a cert).
"""

from __future__ import annotations

import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Bound/approx-oracle queries: certify these stragglers before exact-dual
# ones when seats are scarce (structural risk order, VERDICT r7 item 8).
BOUND_ORACLE_PRIORITY: tuple[str, ...] = (
    "agg_approx_distinct",
    "q6_median_acctbal_per_band_approx",
    "sketch_hll_merge_equals_direct",
)

# Queries whose IMPLEMENTATION changed after their last certification:
# they head the back-fill block at the next rotation — a seat re-certifies
# changed code before staleness rotation resumes (VERDICT r16 item 4: the
# r16 ``ea6b2e9`` union-find change landed after the cluster family's last
# driver row, and r17 rewrote the CC machinery again). Per-round data,
# like EXPECTED_QUEUE: clear entries once the reseating round's
# CORRECTNESS file lands with their green rows.
RESEAT_CHANGED: tuple[str, ...] = (
    "dedup_cluster_canonical",
    "dedup_near_duplicate_clusters",
    "dedup_incremental_clusters",
)


def build_ledger(
    repo: Path = REPO, max_round: int | None = None
) -> dict[str, list[int]]:
    """query -> sorted list of rounds with a fully-green driver row.

    ``max_round`` (inclusive) pins the ledger to what was committed when
    the current window was seated, so mid-round driver artifacts don't
    retroactively change seating invariants (ADVICE r8).
    """
    certs: dict[str, list[int]] = defaultdict(list)
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        n = int(m.group(1))
        if max_round is not None and n > max_round:
            continue
        for q, v in json.loads(f.read_text()).items():
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
                certs[q].append(n)
    return {q: sorted(r) for q, r in certs.items()}


def ever_driver_checked(repo: Path = REPO) -> set[str]:
    """Every query name that has EVER appeared in a driver correctness file
    (rotation must never delete one from the registry)."""
    names: set[str] = set()
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        names.update(json.loads(f.read_text()))
    return names


def statuses(
    ledger: dict[str, list[int]],
    window: tuple[str, ...],
    registered: set[str],
    oracled: set[str],
) -> dict[str, dict]:
    """Full status table for every registered query."""
    seated = set(window)
    out: dict[str, dict] = {}
    for q in registered:
        rounds = ledger.get(q, [])
        if q not in oracled:
            status = "rows-only"
        elif q in seated:
            status = "seated"
        elif len(rounds) >= 2:
            status = "certified"
        else:
            status = "queued"
        out[q] = {"rounds": rounds, "n_certs": len(rounds), "status": status}
    return out


def queue(status_table: dict[str, dict], registry_order: list[str]) -> list[str]:
    """Queued entries in second-certification priority order."""
    queued = [q for q in registry_order if status_table[q]["status"] == "queued"]
    prio = {q: i for i, q in enumerate(BOUND_ORACLE_PRIORITY)}
    return sorted(queued, key=lambda q: (prio.get(q, len(prio)), registry_order.index(q)))


def propose_window(
    ledger: dict[str, list[int]],
    registry_order: list[str],
    oracled: set[str],
    size: int = 50,
) -> tuple[list[str], list[str]]:
    """Derive the next window + queue from the invariants alone.

    Seat priority:
      1. oracled, never certified (seat-at-birth is mandatory);
      2. once-certified, bound/approx oracles first then registry order
         (owed their second row — the no-wasted-seats invariant);
      3. back-fill with twice-certified seats: RESEAT_CHANGED first
         (implementation changed since last cert), then STALEST
         last-certification first (keeps rotating re-verification
         through the registry).
    Whatever under-certified queries don't fit become EXPECTED_QUEUE, in
    ``queue()`` order.
    """
    prio = {q: i for i, q in enumerate(BOUND_ORACLE_PRIORITY)}
    reg_idx = {q: i for i, q in enumerate(registry_order)}
    births = [q for q in registry_order if q in oracled and not ledger.get(q)]
    once = sorted(
        (q for q in registry_order if q in oracled and len(ledger.get(q, [])) == 1),
        key=lambda q: (prio.get(q, len(prio)), reg_idx[q]),
    )
    owed = births + once
    window = owed[:size]
    # overflow (births beyond the seat count included) queues in the
    # same (bound-oracle priority, registry order) key queue() uses
    queued = sorted(
        owed[size:], key=lambda q: (prio.get(q, len(prio)), reg_idx[q])
    )
    if len(window) < size:
        reseat = {q: i for i, q in enumerate(RESEAT_CHANGED)}
        done = sorted(
            (q for q in registry_order if q in oracled and len(ledger.get(q, [])) >= 2),
            key=lambda q: (reseat.get(q, len(reseat)), ledger[q][-1], reg_idx[q]),
        )
        window += done[: size - len(window)]
    return window, queued


def main() -> int:
    import __spark_entry__ as entry
    from pinterest_data_pipeline_spark.plans import oracles

    # Rotation-aware (VERDICT r10 item 3): evaluate as-of SEATING_ROUND-1
    # so a CORRECTNESS_r{SEATING_ROUND}.json landing mid-round can neither
    # redden a frozen tree (r10: the 39 session-4/5/6 births went
    # "never-certified and unseated" the moment r10's artifact landed,
    # though the rotation that seats them was already queued) nor green a
    # wrong one. --propose-window inherits the same cap: bump
    # SEATING_ROUND first, then propose — the proposal then reads exactly
    # the rounds the rotation may know about.
    ledger = build_ledger(max_round=entry.SEATING_ROUND - 1)
    registry_order = list(entry.queries())

    if "--propose-window" in sys.argv:
        idx = sys.argv.index("--propose-window")
        size = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 50
        window, queued = propose_window(
            ledger, registry_order, set(oracles.ORACLES), size
        )
        print("PRIORITY_WINDOW: tuple[str, ...] = (")
        for q in window:
            certs = ",".join(f"r{n}" for n in ledger.get(q, [])) or "birth"
            print(f'    "{q}",  # {certs}')
        print(")")
        print("\nEXPECTED_QUEUE: tuple[str, ...] = (")
        for q in queued:
            print(f'    "{q}",')
        print(")")
        return 0
    table = statuses(
        ledger, entry.PRIORITY_WINDOW, set(registry_order), set(oracles.ORACLES)
    )
    width = max(len(q) for q in registry_order) + 2
    for q in registry_order:
        row = table[q]
        rounds = ",".join(f"r{n}" for n in row["rounds"]) or "-"
        print(f"{q:<{width}} {row['status']:<10} certs={row['n_certs']}  {rounds}")
    qd = queue(table, registry_order)
    print(f"\n{len(registry_order)} registered; "
          f"{sum(1 for r in table.values() if r['status'] == 'seated')} seated; "
          f"{len(qd)} queued; "
          f"{sum(1 for r in table.values() if r['status'] == 'certified')} certified; "
          f"{sum(1 for r in table.values() if r['status'] == 'rows-only')} rows-only")
    if qd:
        print("queue (second-certification priority):")
        for q in qd:
            print(f"  {q}")
    never = [
        q for q, r in table.items()
        if r["n_certs"] == 0 and r["status"] not in ("seated", "rows-only")
    ]
    if never:
        # births overflow the window only when every seat is itself a
        # birth — then the overflow legitimately queues for next round
        seated_with_history = [
            q for q in entry.PRIORITY_WINDOW if ledger.get(q, [])
        ]
        if seated_with_history:
            print(f"\nRED FLAG oracled-never-certified and unseated: {never}")
            return 1
        print(f"\nbirth overflow (window is 100% births): {never} "
              "queue for next round")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
