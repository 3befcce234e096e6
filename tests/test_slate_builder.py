"""Invariants of the mechanical slate generator (tools/slate_builder.py) —
the rotation policy as code, not prose. These tests pin the r10+ regime:
standing canaries always present, never-certified entries take priority,
changed entries jump the staleness queue, re-certs fill oldest-first, and
no two drain-heavy entries sit adjacent."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import slate_builder as sb  # noqa: E402

from flock_spark.registry import CERTIFIED_ROUNDS, REGISTRY, _load_all  # noqa: E402


def test_standing_canaries_are_certified_and_span_families():
    _load_all()
    for name in sb.STANDING_CANARIES:
        assert name in REGISTRY, f"canary {name} not registered"
        assert name in CERTIFIED_ROUNDS, f"canary {name} never certified"
    # one canary per family, no duplicates; the front is 10 in steady-state
    # rounds and may shrink (never below 4) when a changed-entry wave
    # claims the slots (see the ROUND 13 REDUCTION note in slate_builder)
    assert len(set(sb.STANDING_CANARIES)) == len(sb.STANDING_CANARIES)
    assert 4 <= len(sb.STANDING_CANARIES) <= 10


def test_generated_slate_shape_and_priorities():
    _load_all()
    slate = sb.build_slate(50)
    assert len(slate) == 50
    assert len(set(slate)) == 50
    assert all(n in REGISTRY for n in slate)
    # canaries always included
    missing_canaries = [n for n in sb.STANDING_CANARIES if n not in slate]
    assert not missing_canaries
    # never-certified entries take priority over every re-cert
    never = [n for n in REGISTRY if n not in CERTIFIED_ROUNDS]
    if len(never) <= 50 - len(sb.STANDING_CANARIES):
        unslated = [n for n in never if n not in slate]
        assert not unslated, f"never-certified left off: {unslated}"


def test_generated_slate_spreads_heavies():
    slate = sb.build_slate(50)
    for a, b in zip(slate, slate[1:]):
        assert not (sb._is_heavy(a) and sb._is_heavy(b)), (
            f"adjacent heavy entries: {a}, {b}"
        )


def test_recerts_fill_oldest_certified_first():
    _load_all()
    slate = sb.build_slate(50)
    never = {n for n in REGISTRY if n not in CERTIFIED_ROUNDS}
    changed = set(sb.changed_entries()) | set(sb.forced_recerts())
    recerts = [
        n for n in slate
        if n not in never and n not in changed and n not in sb.STANDING_CANARIES
    ]
    if recerts:
        # every selected re-cert must be at least as stale as every
        # certified entry left out (staleness = certification round)
        chosen_worst = max(CERTIFIED_ROUNDS[n] for n in recerts)
        left_out = [
            n for n in CERTIFIED_ROUNDS
            if n not in slate and n not in changed and n not in sb.STANDING_CANARIES
        ]
        if left_out:
            left_best = min(CERTIFIED_ROUNDS[n] for n in left_out)
            assert chosen_worst <= left_best, (
                "a fresher entry was re-certed while a staler one waited"
            )


def test_fingerprints_cover_registry_and_are_stable():
    _load_all()
    fps = sb.entry_fingerprints()
    assert set(fps) == set(REGISTRY)
    # deterministic: two computations agree
    assert fps == sb.entry_fingerprints()


def test_rebuild_history_matches_committed_ledger():
    # Cap at the committed ledger's horizon: the driver drops round N's
    # artifact after round close, so a newer not-yet-folded artifact must
    # not turn this red (it is the next round-open's fold input).
    derived = sb.rebuild_history(max_round=max(CERTIFIED_ROUNDS.values()))
    for name, rn in CERTIFIED_ROUNDS.items():
        assert derived.get(name) == rn, (
            f"{name}: committed {rn} != derived {derived.get(name)}"
        )
