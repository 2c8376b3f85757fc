"""Registry meta-contract: invariants the driver's correctness gate
assumes, pinned so future query additions can't silently break them."""

from __future__ import annotations

import re

from mapreduce_google_spark.io import TABLES
from mapreduce_google_spark.queries import REGISTRY


def test_names_are_unique_and_well_formed():
    assert len(REGISTRY) == len(set(REGISTRY))
    for name in REGISTRY:
        assert re.fullmatch(r"t\d{2,3}b?_[a-z0-9_]+", name), name


def test_oracles_reference_only_known_tables():
    """Every FROM/JOIN target in an oracle must be a driver-registered
    view (or an inline subquery) — a typo'd table fails at grade time."""
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        ctes = set(
            re.findall(
                r"(?:WITH(?:\s+RECURSIVE)?|,)\s*([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*(?:MATERIALIZED\s*)?\(",
                spec.oracle,
                re.I,
            )
        )
        for tbl in re.findall(
            r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", spec.oracle, re.I
        ):
            assert tbl in TABLES or tbl in ctes, f"{name}: unknown table {tbl!r}"


def test_headline_queries_are_oracle_checked():
    """Bench queries must also be correctness-gated — a fast wrong answer
    is worse than a slow right one. Two approximate-by-construction
    exceptions, each with measured evidence instead of a SQL oracle:
    t22 (precision/recall vs the exact operator + t120 invariants) and
    t25 (recall vs exact t18, asserted in tests and reported by
    bench.py next to the exact number)."""
    approx_with_measured_evidence = {"t22_minhash_lsh_pairs", "t25_ivf_topk"}
    for name, spec in REGISTRY.items():
        if spec.headline:
            assert (
                spec.oracle is not None or name in approx_with_measured_evidence
            ), name


def test_every_query_declares_semantics():
    for name, spec in REGISTRY.items():
        assert spec.doc, f"{name} has no doc"
        assert spec.tags, f"{name} has no tags"


def test_builders_are_importable_functions():
    """Lambdas don't pickle and read poorly in COVERAGE.md — require
    named module-level builders."""
    for name, spec in REGISTRY.items():
        assert spec.builder.__name__ != "<lambda>", name


def test_driver_window_ordering():
    """The external harness checks only the FIRST 50 registry entries
    (CORRECTNESS_r01 evidence), so ordering is part of the contract:
    every window slot must be oracle-bearing (rows-only specs waste the
    slot) and iteration order must match DRIVER_WINDOW exactly.

    The r5 one-time exception for the rows-only trio (t64/t71/t82) is
    retired: their rows-only driver evidence was banked in
    CORRECTNESS_r05 and every future slot must buy a full hash check."""
    from mapreduce_google_spark.queries import DRIVER_WINDOW

    names = list(REGISTRY)
    assert len(DRIVER_WINDOW) == 50
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)
    for name in DRIVER_WINDOW:
        assert REGISTRY[name].oracle is not None, f"{name} wastes a window slot"


def test_staleness_budget():
    """Steady-state rotation budget (VERDICT r05 item 2), as an
    assertion rather than prose: with len(REGISTRY) entries (225 at the
    time of writing; the assertions below derive from the live count)
    and 47 rotating window slots per round, every oracle-bearing entry
    must be re-provable within <=5 rounds. Concretely: counting the CURRENT
    DRIVER_WINDOW as evidence for the upcoming round, no oracle-bearing
    entry's last-checked round may be more than 4 rounds behind it.
    Rows-only specs are exempt (a window slot can never buy them a hash
    row; their invariant twins carry the evidence and are themselves
    budgeted here)."""
    import glob
    import json
    import os

    from mapreduce_google_spark.queries import DRIVER_WINDOW

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    rounds = []
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        rounds.append(rnd)
        with open(f) as fh:
            for name in json.load(fh):
                last[name] = max(last.get(name, 0), rnd)
    assert rounds, "no correctness history found"
    current = max(rounds) + 1
    for name in DRIVER_WINDOW:  # the upcoming round's evidence
        last[name] = current
    # derive the budget from the LIVE registry so registrations keep the
    # rotation math auditable: 47 rotating slots serve every
    # oracle-bearing non-canary entry stalest-first, so worst-case
    # staleness is ceil(rotating / 47) rounds (5 at 225 entries)
    n_rotating = (
        sum(1 for s in REGISTRY.values() if s.oracle is not None and not s.retired)
        - 3
    )
    budget = -(-n_rotating // 47)
    over = [
        f"{name} (last r{last[name]}, staleness {current - last[name]})"
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
        and not spec.retired  # retired twins left the rotation
        and name in last  # new entries have no history yet: the planner
        # policy (never-checked first) schedules them into the NEXT
        # window, asserted below
        and current - last[name] > budget - 1
    ]
    assert not over, f"entries exceed the {budget}-round staleness budget: {over}"

    # never-checked oracle-bearing entries must be few enough to all fit
    # in the next window's non-canary slots — otherwise evidence debt is
    # accumulating faster than the rotation can pay it down
    never = [
        name
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
        and not spec.retired
        and name not in last
        and name not in DRIVER_WINDOW
    ]
    assert len(never) <= 47, f"never-checked backlog outgrew one window: {never}"


def test_window_is_policy_output():
    """The committed DRIVER_WINDOW must BE the rotation policy's output —
    since r9 it is computed at import (_compose_driver_window), so this
    guards against someone reintroducing a hand-pasted literal that can
    drift one rotation behind the correctness history (the exact failure
    that red-ed the tree at the r7 and r8 round boundaries)."""
    from mapreduce_google_spark.queries import (
        DRIVER_WINDOW,
        _compose_driver_window,
    )

    assert list(DRIVER_WINDOW) == list(_compose_driver_window())


def test_rotation_survives_future_round_boundaries():
    """Simulate TEN future round boundaries: at each one the current
    window lands as that round's CORRECTNESS artifact, the window
    recomposes from the updated history, and the staleness budget must
    hold. This is the structural proof that the self-rotating window
    ends the every-round-red alarm: no reachable history state can push
    an oracle-bearing entry past the budget, because stalest-first
    rotation always schedules the at-risk cohort next."""
    import copy

    from mapreduce_google_spark import queries as q

    last = copy.deepcopy(q._correctness_last_checked())
    assert last, "no correctness history found"
    current = max(last.values()) + 1
    reg = list(REGISTRY)
    order = {n: i for i, n in enumerate(reg)}
    oracle_bearing = [
        n
        for n in reg
        if REGISTRY[n].oracle is not None
        and not REGISTRY[n].retired
        and n not in q.WINDOW_CANARIES
    ]
    budget = -(-len(oracle_bearing) // (q.WINDOW_SIZE - len(q.WINDOW_CANARIES)))
    for rnd in range(current, current + 10):
        never = [n for n in oracle_bearing if n not in last]
        stale = sorted(
            (n for n in oracle_bearing if n in last),
            key=lambda n: (last[n], order[n]),
        )
        window = (list(q.WINDOW_CANARIES) + never + stale)[: q.WINDOW_SIZE]
        for name in window:  # the driver checks the window → evidence lands
            last[name] = rnd
        over = [
            f"{n} (last r{last[n]}, staleness {rnd + 1 - last[n]})"
            for n in oracle_bearing
            if n in last and rnd + 1 - last[n] > budget
        ]
        assert not over, f"round r{rnd} boundary would alarm: {over}"


def test_readme_registry_counts():
    """README's registry-capacity numbers must equal the live registry —
    they drifted twice (r7, r8 verdicts both flagged it); now they are
    pinned. When this fires, update the three README lines."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "README.md")) as fh:
        readme = fh.read()
    total = len(REGISTRY)
    active = sum(1 for s in REGISTRY.values() if not s.retired)
    oracle_active = sum(
        1 for s in REGISTRY.values() if s.oracle is not None and not s.retired
    )
    headroom = 3 + 47 * 5 - oracle_active
    retired = total - active
    assert f"{total} QuerySpecs ({active} active + {retired} retired" in readme
    assert f"{oracle_active}/{active} active queries are oracle-checked" in readme
    assert f"headroom: 238 − {oracle_active} = {headroom}" in readme


def test_oracles_are_nonvacuous_at_driver_scale():
    """Every oracle must return rows at sf0.01 (the driver's gate
    scale) — a hash match between two empty results proves nothing, and
    the r04 vacuity audit caught exactly one silent case (t163's
    absolute rare-token rule on the closed-vocabulary fixture).
    t02_grep is the single allowed empty (its non-vacuous twin is
    t02b). DuckDB-only, so the sweep is cheap."""
    import duckdb

    from mapreduce_google_spark.io import TABLES

    allowed_empty = {"t02_grep"}
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    empty = [
        name
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
        and duck.execute(f"SELECT count(*) FROM ({spec.oracle})").fetchone()[0]
        == 0
    ]
    duck.close()
    assert set(empty) <= allowed_empty, f"vacuous oracles: {empty}"


def test_rotation_headroom():
    """Registry end-game policy (VERDICT r07 item 3), as an assertion:
    the driver window rotates 47 non-canary slots with a 5-round
    staleness budget, so the hard capacity is 3 + 47*5 = 238
    oracle-bearing ACTIVE entries. Require >=5 slots of headroom so the
    ceiling can't be hit silently — when this fires, either stop
    registering or retire superseded twins (QuerySpec.retired=True, see
    README "Registry capacity"); r8 retired t37/t50/t155 in favor of
    t235/t33/t16."""
    capacity = 3 + 47 * 5
    active = sum(
        1 for s in REGISTRY.values() if s.oracle is not None and not s.retired
    )
    assert capacity - active >= 5, (
        f"only {capacity - active} driver-window slots of headroom left "
        f"({active}/{capacity} oracle-bearing active entries) — retire a "
        "superseded twin or stop registering (README: Registry capacity)"
    )
    # retirement must name a successor and keep local certification: a
    # retired spec still carries its oracle so test_queries_oracle covers it
    for name, spec in REGISTRY.items():
        if spec.retired:
            assert spec.oracle is not None, f"{name}: retired AND uncheckable"
