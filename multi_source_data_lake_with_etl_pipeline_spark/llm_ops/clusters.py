"""Duplicate-cluster resolution: connected components over a near-dup
pair graph, plus cluster-based dedup (keep one representative per
component).

Pair finders (``dedup.py``) emit EDGES; real dedup needs COMPONENTS —
if A~B and B~C, then {A,B,C} is one duplicate cluster even when A~C
never scored above threshold (similarity is not transitive, dedup
policy usually is). This module closes that gap with an iterative
min-label propagation in pure DataFrame ops:

Scale design:

- Each iteration is two hash joins + one aggregation, all on the node
  id — identical shuffle key every round, so at scale a co-partitioned
  exchange is reused rather than re-planned.
- **Pointer jumping** (label <- label of label) runs after every edge
  propagation, collapsing chains exponentially: convergence in
  O(log diameter) rounds, not O(diameter). Near-dup clusters are
  near-cliques (diameter 2-3) so 3-4 rounds is typical; a path graph
  of 1000 nodes still converges in ~10.
- Lineage is truncated per iteration (``localCheckpoint``) — iterative
  self-joins otherwise grow the plan exponentially and stall the
  optimizer long before the executors break a sweat. On a cluster,
  checkpoint to HDFS instead for fault tolerance.
- Convergence is decided by an aggregated change COUNT (one scalar per
  round) — never by collecting labels to the driver.

Reference parity: the reference dedups per exact key only
(``transformers.py`` drop_duplicates shapes); component-level near-dup
clustering is part of the engine's training-data superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Below this many (symmetrized) edges the component graph is resolved
# with union-find on the driver instead of iterative joins — the same
# size-gated strategy switch as Spark's broadcast-join threshold. A
# near-dup graph is orders of magnitude smaller than its corpus (only
# docs WITH a duplicate appear), so even very large corpora often fall
# under this; the distributed path below remains the default shape and
# takes over automatically past the threshold.
SMALL_GRAPH_EDGES = 1_000_000


def _driver_union_find(rows: list, utype: T.DataType, spark) -> DataFrame:
    """Min-label union-find over collected (u, v) edges. O(E α(E))
    single-threaded — for graphs under SMALL_GRAPH_EDGES this beats
    4-6 distributed join rounds by a wide margin and produces the
    identical (node, min-reachable-id) labeling."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in rows:
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        if rv < ru:  # root is always the component minimum
            ru, rv = rv, ru
        parent[rv] = ru
    nodes = set()
    for u, v in rows:
        nodes.add(u)
        nodes.add(v)
    schema = T.StructType(
        [T.StructField("node", utype), T.StructField("component", utype)]
    )
    return spark.createDataFrame([(n, find(n)) for n in sorted(nodes)], schema)


def connected_components(
    edges: DataFrame,
    src: str = "id_1",
    dst: str = "id_2",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Resolve ``edges`` into components; returns ``(node, component)``
    for every node that appears in at least one edge, where
    ``component`` is the MINIMUM node id reachable from ``node`` (a
    canonical, engine-independent cluster label).

    Strategy is size-gated (one count on the persisted edge set, which
    the first iteration needed anyway): graphs at or under
    ``small_graph_edges`` are solved with driver union-find; larger
    graphs run min-label propagation with pointer jumping —
    deterministic for any edge order, identical labels either way.
    ``max_iter`` is a safety rail — the loop exits on the first round
    with zero label changes (O(log diameter) rounds).
    """
    # Persist the INPUT before symmetrizing: the union's two branches
    # are two consumers of the edge DAG, and when edges is itself an
    # expensive pipeline (a fuzzy join, a similarity join) both
    # branches would re-execute it (measured 2x the whole query).
    edges = edges.persist()
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    sym = sym.persist()
    if sym.count() <= small_graph_edges:
        utype = sym.schema["u"].dataType
        out = _driver_union_find(
            [(r["u"], r["v"]) for r in sym.collect()], utype, sym.sparkSession
        )
        sym.unpersist()
        edges.unpersist()
        return out
    labels = (
        sym.select("u").distinct().withColumn("label", F.col("u"))
    ).localCheckpoint(eager=True)

    from pyspark.sql import Observation

    for it in range(max_iter):
        # Edge step: label(u) <- min(label(u), min_{v in N(u)} label(v)).
        nbr = (
            sym.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("_nl")), "v"
            )
            .groupBy("u")
            .agg(F.min("_nl").alias("_nbr_min"))
        )
        stepped = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce(F.col("_nbr_min"), F.col("label"))).alias(
                    "label"
                ),
                F.col("label").alias("_old"),
            )
        )
        # Pointer jump: label(u) <- label(label(u)) — collapses label
        # chains so long paths converge in logarithmic rounds. The
        # convergence metric rides the SAME job via observe(): the
        # checkpoint materialization also tallies changed labels, so
        # each round is ONE job, not materialize + a count job.
        obs = Observation(f"cc_changed_{it}")
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("u").alias("_lu"), F.col("label").alias("_ll")
                ).alias("b"),
                F.col("a.label") == F.col("_lu"),
                "left",
            )
            .select(
                F.col("a.u").alias("u"),
                F.coalesce(F.col("_ll"), F.col("a.label")).alias("label"),
                F.col("a._old").alias("_old"),
            )
            .observe(
                obs,
                F.sum((F.col("_old") != F.col("label")).cast("long")).alias("changed"),
            )
            .drop("_old")
            .localCheckpoint(eager=True)
        )
        labels = jumped
        if (obs.get["changed"] or 0) == 0:
            break

    sym.unpersist()
    edges.unpersist()
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_1",
    dst: str = "id_2",
) -> DataFrame:
    """Assign every row of ``df`` a ``cluster_id``: the component's
    minimum doc id for rows in the near-dup graph, the row's own id for
    singletons. ``(id_col, cluster_id)`` output, one row per input row.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    return df.select(id_col).join(
        comp.select(F.col("node").alias(id_col), F.col("component").alias("cluster_id")),
        id_col,
        "left",
    ).select(
        id_col, F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id")
    )


def keep_cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster-level dedup: keep exactly the rows whose id IS its
    cluster id (the minimum id in each component; singletons keep
    themselves). Returns the surviving rows of ``df``."""
    clustered = dedup_clusters(df, pairs, id_col=id_col)
    keep = clustered.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    return df.join(keep, id_col, "left_semi")
