"""Connected components over an edge DataFrame — alias canonicalization.

GraphFrames is not installed (SURVEY.md §7), so this is plain DataFrame
iteration: min-label propagation to fixpoint. Each node's component label
starts as the node id; every iteration each node takes the min of its own
label and all neighbors' labels. Deterministic (min of string ids), so
output is run- and retry-invariant (SURVEY.md §4 engineering point 5).

Scale notes:
  * lineage is truncated each iteration with localCheckpoint — without it
    the plan doubles per iteration and the job dies on plan-compile time;
  * convergence is O(graph diameter) iterations; alias graphs are
    near-star-shaped (diameter ~2-4). For web-scale general graphs swap in
    the large-star/small-star variant (same join primitives, fewer rounds);
  * the edge table is symmetrized once; each round is one join + one
    groupBy — both hash-partitioned on the node id, so AQE reuses the
    exchange layout between rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Below this many edges the graph is collected and solved with union-find on
# the driver (one job, no iteration). Kept modest: the gate itself costs a
# limit(threshold+1).collect(), i.e. up to threshold rows of driver memory
# even when the graph ends up on the distributed path. Callers that KNOW
# their graph is driver-sized (the alias dictionary is a broadcast-sized
# dimension table by contract) pass a larger explicit threshold.
DRIVER_CC_MAX_EDGES = 100_000


def _driver_union_find(rows: list, spark, node_type: str) -> DataFrame:
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:  # min node id becomes the root → deterministic
                ru, rv = rv, ru
            parent[rv] = ru
    out = sorted((n, find(n)) for n in parent)
    return spark.createDataFrame(
        out, schema=f"node {node_type}, component {node_type}"
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    driver_threshold: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """edges(src, dst) → (node, component) where component = min node id
    reachable. Nodes appearing only as src or only as dst are included.
    The output node/component type mirrors the src column's type.

    driver_threshold: edge count below which the graph is solved with
    union-find on the driver (one job). Pass 0/None to force the
    distributed path, or a larger value when the caller knows the graph is
    driver-sized (saves the iteration entirely)."""
    node_type = edges.schema[src].dataType.simpleString()
    if driver_threshold:
        sample = edges.select(src, dst).limit(driver_threshold + 1).collect()
        if len(sample) <= driver_threshold:
            return _driver_union_find(
                [(r[src], r[dst]) for r in sample], edges.sparkSession, node_type
            )
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"], "inner")
            .select(F.col("u").alias("node"), "component")
            .groupBy("node")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_map(alias_dict: DataFrame) -> DataFrame:
    """canonical_id → component id (min canonical_id of its alias-connected
    component). Ids with no shared alias map to themselves."""
    from bioner_spark.linking import alias_edges

    edges = alias_edges(alias_dict)
    # the alias dictionary is a broadcast-sized dimension table by contract,
    # so the driver union-find path always wins here — gate high explicitly
    comp = connected_components(edges, driver_threshold=2_000_000)
    all_ids = alias_dict.select(F.col("canonical_id").alias("node")).distinct()
    return (
        all_ids.join(comp, "node", "left")
        .select(
            F.col("node").alias("canonical_id"),
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
