"""Near-dup cluster resolution: connected components over a candidate-pair
edge list, and deterministic corpus splits.

The dedup endgame a training pipeline actually runs: MinHash/SimHash/
embedding LSH produce PAIRS (a, b); keeping one document per group needs the
transitive closure — doc A ~ B ~ C must collapse to ONE canonical even when
(A, C) never collided. `connected_components` computes per-doc component
labels with iterative min-label propagation (each round: one join + one
groupBy-min, all equi-joins on ids); `dedup_keep` joins the labels back to
pick the canonical (minimum-id) member per cluster.

Scale notes (100 TB):
  - per iteration the shuffled payload is (id, 8-byte label) — never text;
  - rounds needed = O(component diameter); near-dup graphs are dense
    cliques-of-cliques (diameter typically 2-4), and `max_iter` bounds the
    worst case with a loud error rather than silent truncation;
  - the per-round convergence check is a driver-side count of changed
    labels (one scalar per round, control-plane);
  - `algorithm="two-phase"` switches to the large-star/small-star
    alternation (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond"): O(log n) rounds on ANY graph shape vs O(diameter) for
    min-propagation — the scale path for long-chain corpora, where each
    label-prop round is a full localCheckpoint barrier per hop. Default
    stays "label-prop": its per-round plan is two shuffles with map-side
    combine and its semantics are oracle-reproducible row-for-row; the
    crossover (measured in BENCH.md) is component diameter ≈ 10.

`hash_split` is the deterministic train/val/test assignment (hash60 of
id + salt mod 10_000 against cumulative per-mille thresholds) — pure
per-row arithmetic, partition-independent, reproducible by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60


class ComponentsNotConverged(RuntimeError):
    """min-label propagation hit max_iter with labels still changing."""


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
    algorithm: str = "label-prop",
) -> DataFrame:
    """(id) + undirected edge list -> (id, component) where component is the
    MINIMUM id reachable from the node (isolated nodes label themselves).

    algorithm="label-prop" (default): iterative min-label propagation —
    labels start as own ids; each round a node takes min(own label,
    neighbors' labels); stop when no label changed. Rounds = O(diameter).
    All joins are id equi-joins; the edge list is symmetrized once and
    persisted so every round re-reads a columnar (src, dst) pair table
    instead of re-deriving it.

    algorithm="two-phase": alternating large-star/small-star edge rewrites
    (Kiveris et al. 2014) — rounds = O(log n) regardless of diameter; both
    algorithms return the identical labeling (property-tested against each
    other and a pure-Python union-find).
    """
    from .dedup import _track_persist

    if algorithm == "two-phase":
        return _cc_two_phase(nodes, pairs, id_col, a_col, b_col, max_iter)
    if algorithm != "label-prop":
        raise ValueError(f"unknown connected-components algorithm: {algorithm}")

    edges = _track_persist(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    )
    converged = False
    for _ in range(max_iter):
        # each node's best incoming proposal this round = min over
        # neighbors' current labels
        proposals = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("component").alias("_prop"))
        )
        updated = (
            labels.join(proposals, labels["id"] == proposals["dst"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("_prop"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("_prop"), F.col("component")) < F.col("component"))
                .alias("_changed"),
            )
        )
        # localCheckpoint, NOT persist: persist keeps the full logical plan,
        # so Catalyst re-analyzes an ever-deeper join tree each round and
        # analysis time explodes after ~10 iterations (measured: a 15-node
        # chain never finished). Eager localCheckpoint materializes the
        # round AND truncates lineage to the checkpointed blocks — the
        # standard Spark idiom for iterative algorithms. Executor loss
        # recomputes from the last checkpoint is not a concern for a
        # handful of rounds; a multi-hour job can swap in reliable
        # checkpoint(dir) with the same semantics.
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.select("id", "component")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise ComponentsNotConverged(
            f"components did not stabilize in {max_iter} rounds"
        )
    return labels.select(F.col("id").alias(id_col), "component")


def _cc_two_phase(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    max_iter: int,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al. 2014).

    Edges are kept oriented (hi > lo). Per round:
      large-star: every node u connects its LARGER neighbors to
        m(u) = min(neighborhood(u) + {u}) — output {(v, m(u)) : v > u};
      small-star: every node u (= hi side) connects its smaller
        neighborhood + itself to m(u) = min of its lo's — output
        {(x, m) : x in los + {u}, x != m}.
    The edge set contracts toward one star per component with the global
    min at the center; converged when a full round leaves the set
    unchanged. Rounds = O(log n) on any shape — a D-hop chain that costs
    label-prop D barriers closes here in ~log2(D).

    Per-round payload is (hi, lo) id pairs only; each star op is one
    groupBy-min + one equi-join; eager localCheckpoint truncates lineage
    exactly as the label-prop path does (measured requirement — see the
    comment there).
    """
    hi, lo = F.greatest(F.col(a_col), F.col(b_col)), F.least(F.col(a_col), F.col(b_col))
    e = (
        pairs.filter(F.col(a_col) != F.col(b_col))
        .select(hi.alias("hi"), lo.alias("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    converged = n_edges == 0
    for _ in range(max_iter):
        if converged:
            break
        # large-star over the symmetrized neighborhood
        nbr = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m = nbr.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("mn", "u").alias("m"))
        e1 = (
            nbr.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star on the (hi > lo)-oriented output
        m2 = e1.groupBy("hi").agg(F.min("lo").alias("m"))
        e2 = (
            e1.join(m2, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .union(m2.select("hi", F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # converged iff the round was a no-op: e2 ⊆ e and |e2| == |e|
        n2 = e2.count()
        if n2 == n_edges:
            novel = e2.join(e, ["hi", "lo"], "left_anti").limit(1).count()
            converged = novel == 0
        e, n_edges = e2, n2
    if not converged:
        raise ComponentsNotConverged(
            f"two-phase components did not stabilize in {max_iter} rounds"
        )
    # fixed point is a star per component: every non-min node has exactly
    # one edge (node, component-min); min + isolated nodes label themselves
    stars = e.groupBy("hi").agg(F.min("lo").alias("_comp"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(stars.select(F.col("hi").alias("id"), "_comp"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("_comp", F.col("id")).alias("component"),
        )
    )


def dedup_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster resolution for dedup: every doc gets its near-dup cluster id
    (min doc id of its component) and a keep flag (True for the canonical
    member). Downstream: `docs.join(dedup_keep(...), id).filter("keep")`
    drops every non-canonical near-duplicate in one pass."""
    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col, max_iter=max_iter
    )
    return comp.select(
        id_col,
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col(id_col)).alias("keep"),
    )


def hash_split(
    ids: Column,
    weights: dict[str, float],
    salt: str = "split",
    denom: int = 10_000,
) -> Column:
    """Deterministic corpus split: hash60(id || salt) % denom mapped to the
    first bucket whose cumulative weight covers it. Pure per-row JVM
    arithmetic — partition- and cluster-size-independent, stable across
    runs, and a doc keeps its split when the corpus grows (the property a
    training pipeline needs so eval sets never leak into train).
    """
    total = sum(weights.values())
    h = F.pmod(hash60(F.concat(ids.cast("string"), F.lit(":" + salt))), F.lit(denom))
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total * denom
        cond = h < F.lit(int(round(acc)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(F.lit(last))).alias("split")
