"""G1/G2 — native DataFrame connected components (SURVEY.md §2.11).

GraphFrames is not available (no jar, verified in SURVEY §0/§7.3), so this is
a from-scratch implementation of the **two-phase large-star / small-star**
algorithm (R. Kiveris et al., *Connected Components in MapReduce and Beyond*,
SoCC 2014 — public paper; also the algorithm GraphFrames uses internally).

Why this algorithm at 100 TB scale: it converges in O(log n) rounds versus
O(diameter) for naive label propagation, each round is one groupBy + one
join (shuffle on node id), and ``localCheckpoint(eager=True)`` per round cuts
the lineage/analysis blow-up of iterative DataFrame loops (SURVEY §4.3).

Node ids are compared with Spark ordering (works for strings and numerics);
the component representative is the minimum member id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 50


def _symmetrize(edges: DataFrame) -> DataFrame:
    c0, c1 = edges.columns[:2]
    e = edges.select(F.col(c0).alias("u"), F.col(c1).alias("v"))
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.

    Neighborhoods are undirected — small-star emits directed (high→low)
    edges, so symmetrize before grouping."""
    sym = _symmetrize(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("m", F.least(F.col("u"), F.col("mn"))).select("u", "m")
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high→low; for each u: m = min(N(u) ∪ {u}); emit (x, m)
    for x ∈ N(u) ∪ {u}, x != m."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    attach_nbrs = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("x"), F.col("m"))
    )
    attach_self = mins.select(F.col("u").alias("x"), F.col("m"))
    return (
        attach_nbrs.unionByName(attach_self)
        .filter(F.col("x") != F.col("m"))
        .select(F.col("x").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) sum: overflow-safe under ANSI mode (Spark 4 default).
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = MAX_ITERS,
    local_threshold: int = 100_000,
) -> DataFrame:
    """edges(src, dst) [+ optional vertices(id)] → (id, component).

    component = min member id of the connected component. Isolated vertices
    (present in ``vertices`` but in no edge) map to themselves.

    Size-adaptive execution: a graph under ``local_threshold`` edges is
    solved with driver-side union-find (identical result, none of the
    O(log n) shuffle rounds); larger graphs run distributed
    large-star/small-star. The canonicalization edge set is tiny relative to
    the corpus (distinct near-dup surface pairs), so at 100 TB both paths
    remain realistic — set ``local_threshold=0`` to force distributed
    (property tests exercise both).

    The gate checks BOTH cardinalities (round 5, VERDICT r4 #7): small
    edges with a corpus-sized ``vertices`` frame must NOT collect the
    vertices — the edge components still resolve driver-side, but isolated
    vertices attach distributively (broadcast left_anti against the small
    component table), exactly like the fully distributed path.
    """
    cur = _symmetrize(edges).localCheckpoint(eager=True)
    if local_threshold and cur.count() <= local_threshold:
        if vertices is None:
            return _local_union_find(cur, None)
        # truncating count: dictionary-sized vertices confirm in one cheap
        # early-stopping job; corpus-sized ones never fully scan here.
        if vertices.limit(local_threshold + 1).count() <= local_threshold:
            return _local_union_find(cur, vertices)
        comp = _local_union_find(cur, None)
        vs = vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
        isolated = vs.join(F.broadcast(comp), "id", "left_anti").select(
            "id", F.col("id").alias("component")
        )
        return comp.unionByName(isolated)
    prev_fp = None
    for _ in range(max_iters):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        fp = _edge_fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} iters")

    # Converged star graph: every edge is (member, root).
    assign = cur.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    comp = assign.unionByName(roots).distinct()
    if vertices is not None:
        vs = vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
        isolated = vs.join(comp, "id", "left_anti").select(
            "id", F.col("id").alias("component")
        )
        comp = comp.unionByName(isolated)
    return comp


def _local_union_find(sym: DataFrame, vertices: DataFrame | None) -> DataFrame:
    """Driver-side union-find for small edge sets; same (id, component)
    contract (component = min member)."""
    rows = sym.collect()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["u"]), find(r["v"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set(parent)
    if vertices is not None:
        nodes |= {r[0] for r in vertices.distinct().collect()}
    comp_rows = [(n, find(n) if n in parent else n) for n in sorted(nodes)]
    spark = sym.sparkSession
    return spark.createDataFrame(comp_rows, ["id", "component"])


def canonical_representatives(components: DataFrame) -> DataFrame:
    """G2 — component root IS the canonical representative (min id)."""
    return components.select(
        F.col("id").alias("member"), F.col("component").alias("canonical")
    )
