"""Connected-components dedup clustering + deterministic hash splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _cc_python(n_ids, edges):
    """Driver-side union-find oracle."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def test_connected_components_matches_union_find(spark):
    from cflog2otel_spark.operators.clustering import connected_components
    from cflog2otel_spark.operators.dedup import release_persisted

    ids = list(range(12))
    # two multi-hop chains (diameter > 1), one triangle, isolated nodes
    edges = [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7), (8, 9), (9, 10), (8, 10)]
    nodes = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    pairs = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, pairs).collect()
    }
    release_persisted()
    assert got == _cc_python(ids, edges)


def test_connected_components_long_chain_converges(spark):
    """A 15-node path graph needs multiple propagation rounds (min label
    crosses one hop per round-ish); the loop must converge, not truncate."""
    from cflog2otel_spark.operators.clustering import connected_components
    from cflog2otel_spark.operators.dedup import release_persisted

    n = 15
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["a", "b"])
    got = connected_components(nodes, pairs)
    assert got.filter(F.col("component") == 0).count() == n
    release_persisted()


def test_connected_components_max_iter_raises(spark):
    from cflog2otel_spark.operators.clustering import (
        ComponentsNotConverged,
        connected_components,
    )
    from cflog2otel_spark.operators.dedup import release_persisted

    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["a", "b"])
    with pytest.raises(ComponentsNotConverged):
        connected_components(nodes, pairs, max_iter=2)
    release_persisted()


def test_dedup_keep_flags_canonical(spark):
    from cflog2otel_spark.operators.clustering import dedup_keep
    from cflog2otel_spark.operators.dedup import release_persisted

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(6)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 4), (4, 5)], ["a", "b"])
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in dedup_keep(docs, pairs).collect()}
    release_persisted()
    assert rows == {
        0: (0, True), 1: (1, True), 2: (2, True), 3: (3, True),
        4: (1, False), 5: (1, False),
    }


def test_hash_split_deterministic_and_proportioned(spark):
    from cflog2otel_spark.operators.clustering import hash_split

    n = 20_000
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    split = df.select(
        "doc_id",
        hash_split(F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}),
    )
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.01
    # stable under corpus growth: the first n/2 ids keep their assignment
    small = {
        r["doc_id"]: r["split"]
        for r in spark.range(n // 2)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", hash_split(F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}))
        .collect()
    }
    big = {r["doc_id"]: r["split"] for r in split.collect() if r["doc_id"] < n // 2}
    assert small == big


def test_sessionize_gap_rule(spark):
    """Known timeline: gaps > 30min split sessions; same-second events
    stay ordered by the tiebreak; duration is last-first within session."""
    from datetime import datetime

    from cflog2otel_spark.operators.sessionize import session_stats, sessionize

    T = lambda m, s=0: datetime(2024, 1, 1, 10, m, s)
    rows = [
        # user 1: two sessions (45-min gap between idx 2 and 3)
        (1, 0, T(0)), (1, 1, T(10)), (1, 2, T(12)),
        (1, 3, T(57)), (1, 4, T(59)),
        # user 2: one event = one session
        (2, 5, T(30)),
        # user 3: boundary cases — exactly 30min gap does NOT split,
        # 30min+1s does
        (3, 6, T(0)), (3, 7, T(30)), (3, 8, datetime(2024, 1, 1, 11, 0, 1)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    sess = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(ev).collect()
    }
    assert sess == {
        (1, 0): 0, (1, 1): 0, (1, 2): 0, (1, 3): 1, (1, 4): 1,
        (2, 5): 0,
        (3, 6): 0, (3, 7): 0, (3, 8): 1,
    }
    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_sec"])
        for r in session_stats(ev).collect()
    }
    assert stats[(1, 0)] == (3, 720)
    assert stats[(1, 1)] == (2, 120)
    assert stats[(2, 0)] == (1, 0)
    assert stats[(3, 0)] == (2, 1800)
    assert stats[(3, 1)] == (1, 0)


def test_connected_components_random_graphs_property(spark):
    """Randomized graphs vs a driver-side union-find: 5 seeds, mixed
    density — the iterative min-label propagation must agree exactly."""
    import random

    from cflog2otel_spark.operators.clustering import connected_components
    from cflog2otel_spark.operators.dedup import release_persisted

    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(5, 40)
        m = rng.randint(0, n * 2)
        ids = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        nodes = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
        pairs = (
            spark.createDataFrame(edges, ["a", "b"])
            if edges
            else spark.createDataFrame([], "a long, b long")
        )
        got = {
            r["doc_id"]: r["component"]
            for r in connected_components(nodes, pairs, max_iter=50).collect()
        }
        release_persisted()
        assert got == _cc_python(ids, edges), f"seed {seed}"


def test_sessionize_random_streams_property(spark):
    """Random event streams vs a pure-python sessionizer: same sessions,
    same per-session stats, for several seeds (incl. same-second ties)."""
    import random
    from datetime import datetime, timedelta

    from cflog2otel_spark.operators.sessionize import session_stats

    GAP = 600

    def py_sessions(rows):
        out = {}
        by_user = {}
        for uid, eid, ts in rows:
            by_user.setdefault(uid, []).append((int(ts.timestamp()), eid))
        for uid, evs in by_user.items():
            evs.sort()
            idx = -1
            prev = None
            for t, eid in evs:
                if prev is None or t - prev > GAP:
                    idx += 1
                out.setdefault((uid, idx), []).append(t)
                prev = t
        return {
            k: (len(v), max(v) - min(v)) for k, v in out.items()
        }

    base = datetime(2024, 3, 1)
    for seed in range(4):
        rng = random.Random(seed)
        rows = []
        eid = 0
        for uid in range(rng.randint(1, 6)):
            t = 0
            for _ in range(rng.randint(1, 30)):
                # mix sub-gap and super-gap jumps, incl. zero (same second)
                t += rng.choice([0, 1, 30, 599, 600, 601, 5000])
                rows.append((uid, eid, base + timedelta(seconds=t)))
                eid += 1
        ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
        got = {
            (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_sec"])
            for r in session_stats(ev, gap_seconds=GAP).collect()
        }
        assert got == py_sessions(rows), f"seed {seed}"


def test_two_phase_matches_union_find_random_graphs(spark):
    """Two-phase (large-star/small-star) vs the union-find oracle AND vs
    label-prop on random graphs — identical labeling from both algorithms."""
    import random

    from cflog2otel_spark.operators.clustering import connected_components
    from cflog2otel_spark.operators.dedup import release_persisted

    for seed in range(5):
        rng = random.Random(1000 + seed)
        n = rng.randint(5, 40)
        m = rng.randint(0, n * 2)
        ids = list(range(n))
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        nodes = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
        pairs = (
            spark.createDataFrame(edges, ["a", "b"])
            if edges
            else spark.createDataFrame([], "a long, b long")
        )
        got = {
            r["doc_id"]: r["component"]
            for r in connected_components(
                nodes, pairs, max_iter=50, algorithm="two-phase"
            ).collect()
        }
        release_persisted()
        assert got == _cc_python(ids, edges), f"seed {seed}"


def test_two_phase_adversarial_chain_few_rounds(spark):
    """A 64-hop path is label-prop's worst case (~63 rounds); two-phase must
    close it inside 10 rounds (O(log n)) and still label every node 0."""
    from cflog2otel_spark.operators.clustering import connected_components
    from cflog2otel_spark.operators.dedup import release_persisted

    n = 65
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["a", "b"])
    got = connected_components(nodes, pairs, max_iter=10, algorithm="two-phase")
    assert got.filter(F.col("component") == 0).count() == n
    release_persisted()


def test_two_phase_empty_edges_and_unknown_algorithm(spark):
    from cflog2otel_spark.operators.clustering import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(4)], ["doc_id"])
    empty = spark.createDataFrame([], "a long, b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, empty, algorithm="two-phase").collect()
    }
    assert got == {i: i for i in range(4)}
    with pytest.raises(ValueError):
        connected_components(nodes, empty, algorithm="bogus")
