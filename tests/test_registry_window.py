"""Pin the curated driver window — LEDGER-DRIVEN since round 8.

The correctness driver evaluates only the first 50 ``queries()`` entries,
so the registry prefix is the repo's hard correctness signal. Through
round 7 these invariants were enforced with hand-grown family/queue/
rotated-out constants; VERDICT r7 item 7 replaced that comment surgery
with ``tools/ledger.py``, which derives every query's certification
history (rounds with a fully-green driver row) from the committed
``CORRECTNESS_r*.json`` files. The tests below assert the seating
discipline against that data:

1. the window is exactly driver-sized and every seat is oracle-checked;
2. every oracled query with ZERO certifications is seated (seat-at-birth
   — the judge red-flags oracled-never-certified entries);
3. no twice-certified query occupies a seat while an under-certified
   oracled query waits outside (seats are spent where certification is
   still owed);
4. rotation never DELETES: every query that ever held a driver row stays
   registered with its oracle, so tools/check_parity.py keeps certifying
   the full registry locally.

``EXPECTED_QUEUE`` is the one piece of per-round data: the once-certified
queries expected to wait outside the window this round (none in r9 — the
13 r8 births, the six r8-queued entries, and the r9 births all fit with
27 back-fill seats to spare). Update it when a rotation genuinely leaves
stragglers; the ledger's ``queue()`` orders them bound/approx-oracle
first.

The invariants are evaluated against the ledger AS OF the rotation
(``build_ledger(max_round=SEATING_ROUND - 1)``): once the driver drops
the current round's ``CORRECTNESS_r{N}.json`` mid-round, every seated
query gains a cert, which — uncapped — flipped the no-wasted-seats
invariant red the moment the results landed (ADVICE r8). The cap makes
"was this rotation correct when made?" a stable fact.
"""

from __future__ import annotations

import __spark_entry__ as entry
from pinterest_data_pipeline_spark.plans import oracles
from tools import ledger

DRIVER_WINDOW = 50

# Once-certified queries expected to miss a seat this round (see module
# docstring). r13: the whole 45-entry owed-seconds backlog (2 r12 births
# + 43 queued once-certified) seats with 5 back-fill seats to spare, so
# the queue is EMPTY — after r13 certifies, every oracled query in the
# registry is at least twice driver-certified (VERDICT r12 item 1).
EXPECTED_QUEUE: tuple[str, ...] = ()


def _table():
    led = ledger.build_ledger(max_round=entry.SEATING_ROUND - 1)
    registry_order = list(entry.queries())
    return led, registry_order, ledger.statuses(
        led, entry.PRIORITY_WINDOW, set(registry_order), set(oracles.ORACLES)
    )


def test_priority_window_is_exactly_driver_sized():
    assert len(entry.PRIORITY_WINDOW) == DRIVER_WINDOW
    assert len(set(entry.PRIORITY_WINDOW)) == DRIVER_WINDOW


def test_priority_window_leads_registry():
    names = list(entry.queries())
    assert tuple(names[:DRIVER_WINDOW]) == entry.PRIORITY_WINDOW
    # nothing lost: the reorder must keep every registered query
    assert len(names) == len(set(names))


def test_every_windowed_query_is_oracle_checked():
    missing = [n for n in entry.PRIORITY_WINDOW if n not in oracles.ORACLES]
    assert not missing, f"window entries without DuckDB oracle: {missing}"


def test_never_certified_oracled_queries_are_all_seated():
    """Seat-at-birth: an oracled query must never wait uncertified —
    unless the round's births alone overflow the 50-seat window, in
    which case every seat must be a birth (nothing less deserving holds
    one) and the overflow births certify next round."""
    led, _, table = _table()
    unseated_never = [
        q
        for q, row in table.items()
        if row["n_certs"] == 0 and row["status"] == "queued"
    ]
    if unseated_never:
        non_birth_seats = [
            q for q in entry.PRIORITY_WINDOW if led.get(q, [])
        ]
        assert not non_birth_seats, (
            f"births {unseated_never} wait while previously-certified "
            f"{non_birth_seats} hold seats"
        )
    else:
        assert not unseated_never


def test_no_wasted_seats_while_certification_owed():
    """A twice-certified query may re-take a seat only when nothing
    under-certified is waiting (rotation efficiency — the data-driven
    form of the old ROTATED_OUT pin)."""
    led, _, table = _table()
    waiting = [q for q, row in table.items() if row["status"] == "queued"]
    if waiting:
        wasted = [
            q for q in entry.PRIORITY_WINDOW if len(led.get(q, [])) >= 2
        ]
        assert not wasted, (
            f"twice-certified {wasted} hold seats while {waiting} wait"
        )


def test_rotation_never_deletes_driver_checked_queries():
    """Every query that EVER appeared in a driver correctness file must
    stay registered — losing a seat must never lose parity coverage."""
    names = set(entry.queries())
    missing = ledger.ever_driver_checked() - names
    assert not missing, f"driver-checked queries vanished from registry: {missing}"


def test_queue_matches_expected():
    """The derived queue is per-round DATA, reviewed at rotation time."""
    led, registry_order, table = _table()
    derived = ledger.queue(table, registry_order)
    assert tuple(derived) == EXPECTED_QUEUE, (
        f"queued-now: {derived}; update EXPECTED_QUEUE deliberately "
        "(bound/approx-oracle entries certify first)"
    )


def test_window_is_the_tool_proposal():
    """The committed rotation must be exactly what
    ``tools/ledger.py --propose-window`` derives from the rotation-time
    ledger (VERDICT r8 item 7: rotations are tool output, not comment
    surgery). Deterministic: births in registry order, owed seconds in
    bound-oracle-then-registry order, back-fill stalest-first."""
    led, registry_order, _ = _table()
    window, queued = ledger.propose_window(
        led, registry_order, set(oracles.ORACLES), DRIVER_WINDOW
    )
    assert tuple(window) == entry.PRIORITY_WINDOW
    assert tuple(queued) == EXPECTED_QUEUE


def test_ledger_main_reports_no_red_flags(capsys):
    """main() evaluates as-of SEATING_ROUND-1 (VERDICT r10 item 3), so a
    CORRECTNESS_r{SEATING_ROUND}.json landing mid-round cannot redden a
    correctly-rotated frozen tree."""
    assert ledger.main() == 0
    out = capsys.readouterr().out
    assert "RED FLAG" not in out


def test_families_index_is_current():
    """FAMILIES.md (the family -> queries -> operators map, VERDICT r10
    item 8) is generated from the live registry; a registry change
    without regeneration — or a new prefix with no family row — fails
    here instead of rotting silently."""
    from tools import family_index

    with open(family_index.OUT) as f:
        assert f.read() == family_index.build(), (
            "FAMILIES.md stale: run python tools/family_index.py"
        )


def test_invariant_still_catches_genuinely_unseated_birth():
    """The rotation-aware cap must not blind the invariant: a rotation
    that leaves an oracled-never-certified query outside the window while
    a previously-certified query holds a seat is still red at
    SEATING_ROUND-1 (the exact r10 failure shape, re-created synthetically
    so it can never regress silently)."""
    led, registry_order, _ = _table()
    # Synthesize a bad rotation. Since r11 every oracled query has >=1
    # cert, so the never-certified "birth" is synthesized too: erase one
    # seated query's history in a copied ledger, then evict it from the
    # window and seat an already-certified query in its place.
    led = dict(led)
    birth = entry.PRIORITY_WINDOW[0]
    led[birth] = []
    births = [birth]
    certified = [q for q in registry_order if len(led.get(q, [])) >= 1
                 and q not in entry.PRIORITY_WINDOW]
    assert certified, "fixture shape changed; pick new seeds"
    bad_window = tuple(
        certified[0] if q == births[0] else q for q in entry.PRIORITY_WINDOW
    )
    table = ledger.statuses(
        led, bad_window, set(registry_order), set(oracles.ORACLES)
    )
    assert table[births[0]]["status"] == "queued"
    assert table[births[0]]["n_certs"] == 0
    # the seated query has history, so the never-certified birth waiting
    # outside is exactly the RED FLAG condition main() enforces
    seated_with_history = [q for q in bad_window if led.get(q, [])]
    assert seated_with_history
