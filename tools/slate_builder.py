#!/usr/bin/env python3
"""Mechanical slate generation for the post-closure rotation policy.

Once every registry entry holds a green driver row (full-registry
certification, landed round 9), the DRIVER_SLATE's job changes from coverage
to REGRESSION SURVEILLANCE (COVERAGE.md "Post-closure rotation policy"):

  (a) standing canaries spanning every execution family — the same cheap
      entries every round, so a Spark/engine change shows as a red diff
      immediately;
  (b) any entry whose implementation or oracle text changed that round
      re-certifies THAT round, jumping the staleness queue (detected by
      fingerprinting each entry's oracle SQL + callable source against the
      committed baseline `flock_spark/entry_fingerprints.json`);
  (c) remaining slots filled oldest-certified-first from
      `registry.CERTIFIED_ROUNDS` (ties broken by name), so every entry
      re-certifies at least every ~7 rounds;
  (d) never-certified entries (new operators) take slots ahead of ALL
      re-certs, same as during the coverage era.

Drain-heavy entries (streaming micro-batch drains, memo-heavy audits) are
spread so no two sit adjacent — the driver sweep is cold-per-entry and
co-slated heavies have historically blown the per-entry budget.

Usage:
  python tools/slate_builder.py                      # print next-round slate
  python tools/slate_builder.py --slots 50           # explicit size
  python tools/slate_builder.py --print-history      # CERTIFIED_ROUNDS block
  python tools/slate_builder.py --verify-history     # vs committed dict
  python tools/slate_builder.py --changed            # entries changed vs baseline
  python tools/slate_builder.py --write-fingerprints # refresh baseline (round close)
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FINGERPRINT_PATH = os.path.join(ROOT, "flock_spark", "entry_fingerprints.json")

# (a) Standing canaries: one cheap certified entry per execution family.
#
# ROUND 13 REDUCTION: the optimization rounds (r12+r13) left 46 entries with
# changed fingerprints owing re-certification (rule (b)) — more than fit
# beside the full 10-canary front. Certification debt outranks canary
# redundancy for one round (r12 VERDICT item 1: "Done = CORRECTNESS_r13
# covers the changed set"), so the front temporarily keeps one canary per
# family NOT already exercised by the changed set (which spans dedup, ANN,
# graph, corpus, windows, sketches, joins, aggregates, and the mm_* decode
# paths): relational core, streaming drain, Arrow/pandas UDF, layout/scan
# pruning. Restore the 10-canary front in the next steady-state round.
STANDING_CANARIES: tuple[str, ...] = (
    "proj_arith",               # projection / scalar expressions (relational core)
    "streaming_tumbling_agg",   # streaming micro-batch drain
    "pandas_udaf_weighted_mean",  # Arrow / pandas UDF path
    "zorder_layout_scan",       # layout / scan-pruning family
)

# Rule (b) debt: entries whose fingerprint-change trigger was CONSUMED
# without a re-cert — the committed baseline was regenerated in the same
# round the entry changed, but the entry never entered that round's graded
# slate, so --changed stopped flagging it while its newest green row
# predates the change. Each name maps to the round whose change it still
# owes evidence for; build_slate() jumps these ahead of staleness re-certs
# until CERTIFIED_ROUNDS records a green row >= that round, after which the
# entry drops out of this dict's effect automatically (delete it then).
FORCED_RECERTS: dict[str, int] = {
    # (round 11's three debts — JPEG seed, WET guard, anchored robots —
    # certified green in round 12 and were deleted at the r13 fold.)
}

# Entries whose FIRST execution in a cold-per-entry session is known heavy
# (memoized signatures / IVF assignment / big DuckDB CTE oracles / streaming
# state-store setup). Never slate two of these adjacent.
HEAVY_FIRST_EXECUTION: frozenset[str] = frozenset((
    "crawl_chain_end_to_end",  # WARC shard walk + 5-stage chain, ~9 s cold
    "dedup_lsh_band_tradeoff_audit",
    "analytics_friedman_test",  # ~9-12 s cold: six sequential scalar stages
    "dedup_lsh_recall_audit",
    "dedup_edit_distance_pairs",  # pays the minhash signature memo cold
    "graph_2hop_reach_hll_audit",
    "corpus_quality_dup_calibration",
    "ann_ivf_nprobe_recall_curve",
    "embedding_matryoshka_recall_audit",
    "items_cooccurrence_jaccard",
    "graph_label_prop_communities",
))


def _is_heavy(name: str) -> bool:
    return name in HEAVY_FIRST_EXECUTION or name.startswith("streaming_")


def rebuild_history(max_round: int | None = None) -> dict[str, int]:
    """MOST RECENT fully-green round per entry across CORRECTNESS_r*.json
    (a re-certification refreshes the entry's staleness clock — with
    first-green semantics the same oldest entries would win the stale
    queue every round forever and the rest would never re-certify,
    breaking the rotation policy's ~7-round cadence). Raises if any entry
    went red after certifying (it must be dropped by hand).

    ``max_round`` caps the derivation horizon: the driver drops round N's
    artifact after round close, so tests comparing against the committed
    ledger pass ``max(CERTIFIED_ROUNDS.values())`` to ignore the not-yet-
    folded artifact. The round-open fold uses the uncapped default."""
    derived: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not files:
        raise FileNotFoundError("no CORRECTNESS_r*.json artifacts in repo root")
    for f in files:
        rn = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if max_round is not None and rn > max_round:
            continue
        for name, row in json.load(open(f)).items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if green:
                derived[name] = max(rn, derived.get(name, rn))
            elif name in derived and derived[name] < rn:
                raise ValueError(
                    f"{name} red in round {rn} after certifying in round "
                    f"{derived[name]}: certification revoked, regenerate the "
                    f"ledger without it"
                )
    return derived


def entry_fingerprints() -> dict[str, str]:
    """sha256 over each entry's oracle SQL + callable source. A changed hash
    means the entry's observable behavior may have changed and it must
    re-certify (rotation rule (b))."""
    from flock_spark.registry import REGISTRY, _load_all

    _load_all()
    fps: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            src = ""
        payload = (spec.oracle or "") + "\n---\n" + src
        fps[name] = hashlib.sha256(payload.encode()).hexdigest()
    return fps


def changed_entries() -> list[str]:
    """Registry entries whose live fingerprint differs from the committed
    baseline (or are absent from it)."""
    if not os.path.exists(FINGERPRINT_PATH):
        return []
    baseline = json.load(open(FINGERPRINT_PATH))
    live = entry_fingerprints()
    return sorted(n for n, fp in live.items() if baseline.get(n) != fp)


def forced_recerts() -> list[str]:
    """FORCED_RECERTS entries still owing a post-change green row (their
    latest certified round predates the round whose change they owe)."""
    from flock_spark.registry import CERTIFIED_ROUNDS, REGISTRY, _load_all

    _load_all()
    return [
        n for n, owed in sorted(FORCED_RECERTS.items())
        if n in REGISTRY and CERTIFIED_ROUNDS.get(n, 0) < owed
        and n not in STANDING_CANARIES
    ]


def build_slate(slots: int = 50) -> list[str]:
    """Next-round slate per rules (a)-(d), heavies spread non-adjacent."""
    from flock_spark.registry import CERTIFIED_ROUNDS, REGISTRY, _load_all

    _load_all()
    never = [n for n in REGISTRY if n not in CERTIFIED_ROUNDS]
    changed = [
        n for n in changed_entries() if n in CERTIFIED_ROUNDS and n not in STANDING_CANARIES
    ]
    changed = changed + [n for n in forced_recerts() if n not in changed]
    taken = set(STANDING_CANARIES) | set(never) | set(changed)
    stale = sorted(
        (n for n in CERTIFIED_ROUNDS if n not in taken),
        key=lambda n: (CERTIFIED_ROUNDS[n], n),
    )
    ordered = list(STANDING_CANARIES) + never + changed
    for n in stale:
        if len(ordered) >= slots:
            break
        ordered.append(n)
    ordered = ordered[:slots]
    return _spread_heavies(ordered)


def _spread_heavies(names: list[str]) -> list[str]:
    """Reorder so no two heavy entries are adjacent (keeps relative order of
    each class; falls back gracefully if heavies outnumber light gaps)."""
    heavy = [n for n in names if _is_heavy(n)]
    light = [n for n in names if not _is_heavy(n)]
    if not heavy:
        return names
    if len(heavy) > len(light):
        return names  # not enough lights to separate every pair
    # Evenly distribute: heavy i goes after light number (i+1)*L//H. With
    # H <= L those positions are strictly increasing (step >= floor(L/H)
    # >= 1), so no two heavies are ever adjacent — the previous fixed-gap
    # walk stranded the leftover heavies in a consecutive tail whenever
    # H did not divide L.
    out: list[str] = []
    pos = {((i + 1) * len(light)) // len(heavy): h for i, h in enumerate(heavy)}
    for i, n in enumerate(light, start=1):
        out.append(n)
        if i in pos:
            out.append(pos[i])
    return out


def _print_history_block(h: dict[str, int]) -> None:
    by_round: dict[int, list[str]] = {}
    for k, v in h.items():
        by_round.setdefault(v, []).append(k)
    for rn in sorted(by_round):
        names = sorted(by_round[rn])
        print(f"    # round {rn} ({len(names)} entries)")
        cur = "   "
        for n in names:
            item = f' "{n}": {rn},'
            if len(cur) + len(item) > 79:
                print(cur)
                cur = "   "
            cur += item
        if cur.strip():
            print(cur)


def main() -> None:
    args = sys.argv[1:]
    if "--print-history" in args:
        _print_history_block(rebuild_history())
        return
    if "--verify-history" in args:
        from flock_spark.registry import CERTIFIED_ROUNDS

        derived = rebuild_history()
        bad = {
            n: (rn, derived.get(n))
            for n, rn in CERTIFIED_ROUNDS.items()
            if derived.get(n) != rn
        }
        missing = sorted(n for n in derived if n not in CERTIFIED_ROUNDS)
        if bad:
            print(f"MISMATCH: {bad}")
            sys.exit(1)
        print(f"history ok: {len(CERTIFIED_ROUNDS)} committed, "
              f"{len(derived)} derivable"
              + (f", {len(missing)} not yet folded in: {missing}" if missing else ""))
        return
    if "--write-fingerprints" in args:
        fps = entry_fingerprints()
        json.dump(fps, open(FINGERPRINT_PATH, "w"), indent=0, sort_keys=True)
        print(f"wrote {len(fps)} fingerprints to {FINGERPRINT_PATH}")
        return
    if "--changed" in args:
        ch = changed_entries()
        print("\n".join(ch) if ch else "(no entries changed vs baseline)")
        return
    slots = 50
    if "--slots" in args:
        slots = int(args[args.index("--slots") + 1])
    slate = build_slate(slots)
    print("DRIVER_SLATE: tuple[str, ...] = (")
    for n in slate:
        marker = "  # heavy" if _is_heavy(n) else ""
        print(f'    "{n}",{marker}')
    print(")")


if __name__ == "__main__":
    main()
