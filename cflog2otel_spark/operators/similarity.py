"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: exact baseline. Dot products via F.zip_with +
    F.aggregate (JVM-side, no Python); the query vector is a literal array
    broadcast into the plan — a map-only scan + one top-k (TakeOrdered).
  - LSH-bucketed ANN (random hyperplane signatures): the scale path. Each
    vector gets a d_sig-bit sign signature; candidates share a signature
    band. At 100 TB this turns all-pairs scoring into per-bucket equi-joins.

Also: pairwise cosine near-dup for embedding dedup (bucketed the same way).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector. Map-only + global
    top-k (Spark plans orderBy+limit as TakeOrderedAndProject — no full
    sort shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane sign signature as a bigint (n_bits <= 63)."""
    bits: Column = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
            F.lit(0).cast("bigint")
        )
        bits = bits.bitwiseOR(bit)
    return bits


def lsh_ann_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_bits: int = 12,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane signature is
    within `probe_hamming` bits of the query's (multi-probe LSH). The
    signature filter is a plain integer predicate -> pushes into the scan.
    """
    planes = _hyperplanes(len(query), n_bits, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) >= 0:
            qsig |= 1 << i
    sig = signature_col(F.col(vec_col), planes)
    cand = emb.withColumn("_sig", sig).filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = cand.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def ivf_index(
    emb: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: KMeans over the embeddings; returns the table
    with a `_cluster` column plus the centroid list. At scale the clustered
    table is written partitioned by `_cluster`, so a probe reads only
    n_probe partitions of the corpus (partition pruning = the inverted
    file). Training samples the data (KMeans|| init, MLlib)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    feats = emb.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="_features").fit(feats)
    assigned = model.transform(feats).withColumnRenamed("prediction", "_cluster").drop(
        "_features"
    )
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    return assigned, centers


def ivf_ann_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index: tuple[DataFrame, list[list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: score only the n_probe clusters whose
    centroids are closest to the query. Pass a prebuilt `index` to amortize
    training across queries (the realistic serving shape)."""
    assigned, centers = index if index is not None else ivf_index(
        emb, n_clusters, id_col, vec_col, seed
    )

    def dist2(c: list[float]) -> float:
        return sum((a - b) ** 2 for a, b in zip(c, query))

    probe = sorted(range(len(centers)), key=lambda i: dist2(centers[i]))[:n_probe]
    cand = assigned.filter(F.col("_cluster").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Pairs with cosine >= threshold. exact=True does the full self-join
    (oracle-comparable at test scale); default buckets by hyperplane
    signature first (high-cosine pairs almost surely share all sign bits).
    """
    if exact:
        a = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
        b = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
        pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    else:
        dim = len(emb.select(vec_col).first()[0])
        planes = _hyperplanes(dim, n_bits, seed)
        sig = signature_col(F.col(vec_col), planes)
        keyed = emb.select(F.col(id_col), F.col(vec_col), sig.alias("_sig"))
        w = Window.partitionBy("_sig")
        keyed = keyed.withColumn("_bw", F.count(F.lit(1)).over(w)).filter(
            F.col("_bw") <= max_bucket
        )
        a = keyed.select(F.col("_sig"), F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
        b = keyed.select(F.col("_sig"), F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
        pairs = a.join(b, "_sig").filter(F.col("a") < F.col("b"))
    return pairs.select(
        "a", "b", F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)
