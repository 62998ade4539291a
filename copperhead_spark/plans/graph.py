"""Fixed-point PageRank over the customer–supplier interaction graph.

Graph analytics beyond the reference (its only graph-shaped op is the
overlap-removal set logic, python/postprocessor.py); connected
components already live in plans/dedup.py / operators/graph.py.  This
adds the other canonical iterative-propagation operator, PageRank, in a
form the DuckDB oracle can replay bit-exactly: all arithmetic is BIGINT
(ranks in micro-units, integer division for the out-degree split and the
damping), so partial-agg reordering can never change a result.

Scale design: the edge list is the big table; per iteration we do ONE
shuffle — join(ranks, src) then groupBy(dst) — and the rank table (one
row per node) is orders of magnitude smaller than edges.  At 100 TB the
edges are bucketed by src once, so every iteration's join co-locates and
only the groupBy(dst) exchanges data.  Iteration count is fixed (the
unrolled-CTE oracle mirrors it); convergence-driven stopping would use
the same loop with an AQE-observed delta metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.hashing import mix_sql
from copperhead_spark.plans.registry import register

_ITERS = 3
_R0 = 1_000_000  # initial rank, micro-units
_TELEPORT = 150_000  # 0.15 in micro-units
_DAMP_NUM, _DAMP_DEN = 85, 100  # 0.85 damping as an exact ratio
_SUPP_BASE = 1_000_000  # node-id offset separating supplier from customer ids


# ---------------------------------------------------------------------------
# shared per-session edge materialization
# ---------------------------------------------------------------------------

_EDGE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _graph_npart(spark: SparkSession, sf_dir: str) -> int:
    """Scale-adaptive partition count for the cached edge relations.

    The cached edge partitioning must survive the cache (it is what the
    iteration joins reuse), so AQE cannot size it — its coalescing is
    disabled across InMemoryRelation boundaries precisely to keep cached
    output partitioning stable.  Mirror AQE's own sizing instead: the
    in-memory edge relation is bounded by ~3x the compressed source
    bytes (orders + lineitem here; measured 13.5 MB parquet -> 27 MB
    cached at sf0.1), target the session's advisory partition size, and
    cap at defaultParallelism so small inputs never fan out into more
    tasks than cores (guide §2.2 "fewer, larger partitions"; measured at
    sf0.1: 2-16 partitions are equivalent, 64 doubles the family's CPU
    on per-task overhead).  Grows linearly with input bytes, so at
    100 TB the same rule yields thousands of advisory-sized partitions."""
    import os

    adv = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    a = adv.strip().lower().removesuffix("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    mult = units.get(a[-1:], 1)
    adv_bytes = int(float(a[:-1] if a[-1:] in units else a)) * mult
    src_bytes = 0
    for t in ("orders", "lineitem"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(p):
            src_bytes += os.path.getsize(p)
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                src_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    est_mem = 3 * src_bytes
    # floor 2, not 1: HashPartitioning(k, 1) degenerates to a single
    # partition, which EnsureRequirements treats as no distribution
    # guarantee at all — the iteration joins re-shuffled the edge side
    # to the session shuffle default, resurrecting the per-iteration
    # edge Exchange this layer exists to remove (measured)
    return max(2, min(-(-est_mem // adv_bytes), spark.sparkContext.defaultParallelism))


_EDGE_PART_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def shared_edges(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    build,
    partition_on: str | None = None,
) -> DataFrame:
    """Materialize an edge relation ONCE per (SparkContext, sf, kind)
    and reuse it across every graph query in the session.

    pagerank / LPA / k-core / triangles / degree-histogram consume three
    edge relations between them; before this cache each query re-ran its
    orders⋈lineitem (or per-order pair-expansion) build — five rebuilds
    of the same relations per bench sweep, dominating the family's cost.
    The localCheckpoint pins the computed blocks on the executors for
    the session's lifetime (edge lists are DISTINCT-pair projections —
    orders of magnitude smaller than lineitem), so repeat queries start
    at the iteration loop.

    r12, ``partition_on``: a checkpointed DataFrame comes back as `Scan
    ExistingRDD ... UnknownPartitioning(0)` (LogicalRDD drops the
    physical plan's output partitioning), so every unrolled iteration of
    every iterative consumer was re-Exchanging the FULL edge list to
    re-establish hashpartitioning(src) — measured 2-3 10-14 MB edge
    shuffles per query at sf0.1, and at 100 TB that is re-shuffling the
    graph once per iteration (guide §2.4).  Fix: layer a persist()-ed
    ``repartition(_graph_npart, partition_on)`` OVER the checkpoint.
    InMemoryRelation preserves its cached plan's output partitioning
    (Spark pins it: spark.sql.optimizer.canChangeCachedPlanOutput-
    Partitioning defaults to false), so the src-partitioned relation
    satisfies every iteration join's distribution requirement directly
    and ONLY the node-sized frontier moves.  The two layers are
    deliberate: SQL caches are dropped by spark.catalog.clearCache()
    (the bench runs it as a pre-query barrier), and re-persisting from
    the checkpoint blocks costs one edge-sized shuffle, not a rebuild
    of the orders⋈lineitem subtree.

    At 100 TB this seam is a write-once BUCKETED parquet table keyed on
    src (bk1_bucketed_join_agg demonstrates bucketed write+read joining
    with no re-Exchange); the session cache is the local[] analogue.
    Keys include the SparkContext applicationId: a restarted session
    rebuilds instead of dereferencing dead checkpoint blocks, and stale
    contexts' entries are dropped so their executor blocks can be
    reclaimed."""
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    base = _EDGE_CACHE.get(key)
    if base is None:
        for cache in (_EDGE_CACHE, _EDGE_PART_CACHE):
            for stale in [k for k in cache if k[0] != key[0]]:
                del cache[stale]
        base = build().localCheckpoint()
        _EDGE_CACHE[key] = base
    if partition_on is None:
        return base
    layered = _EDGE_PART_CACHE.get(key)
    if layered is None:
        layered = base.repartition(
            _graph_npart(spark, sf_dir), F.col(partition_on)
        )
        _EDGE_PART_CACHE[key] = layered
    if not layered.storageLevel.useMemory and not layered.storageLevel.useDisk:
        layered.persist()
        layered.count()
    return layered


def _edges_deg(spark: SparkSession, sf_dir: str):
    """Symmetrized customer<->supplier edge list + out-degrees.

    src/dst are BIGINT node ids: customers keep o_custkey, suppliers get
    l_suppkey + _SUPP_BASE.  Symmetrizing guarantees every node has
    out-degree >= 1 (no dangling-mass term needed)."""

    def build_ed() -> DataFrame:
        orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        e0 = (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .select(
                F.col("o_custkey").alias("src"),
                (F.col("l_suppkey") + F.lit(_SUPP_BASE)).alias("dst"),
            )
            .distinct()
        )
        # r12 reshape, three changes in one (guide §2.4 / §2.3):
        # (1) symmetrize by EXPLODING a 2-element array instead of
        #     union-of-reversed — e0 is referenced once, so the
        #     pre-union localCheckpoint (a whole extra materialization
        #     round-trip, kept only because Catalyst does not CSE
        #     across a union) is no longer needed at all;
        # (2) the one explicit repartition("src") is the SAME exchange
        #     the old window implied, and the checkpointed result still
        #     carries hashpartitioning(src) for the iteration joins;
        # (3) degree via groupBy on that partitioning (partial-agg, no
        #     extra exchange) broadcast-joined back — replacing the
        #     WindowExec, which had to SORT all |2E| rows by src when
        #     only a per-src count was wanted (at 100 TB the sort is
        #     n log n over the edge list; the groupBy is a |nodes|-row
        #     rollup).  Broadcast join preserves the left side's
        #     partitioning.  Measured warm at sf0.1: build 5.1 -> 4.5 s
        #     wall and one fewer driver round-trip; deg values verified
        #     row-identical to the window form.
        edges = e0.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        return edges.join(F.broadcast(deg), "src")

    # materialized ONCE per session via shared_edges (each unrolled
    # iteration of every consumer references the edge list, and without
    # truncation Catalyst re-derives the orders⋈lineitem join + distinct
    # per iteration); served src-partitioned (partition_on) so the
    # iteration joins move only the frontier
    ed = shared_edges(spark, sf_dir, "bipartite_ed", build_ed, partition_on="src")
    # the degree table derives FROM the cached relation (distinct on a
    # |nodes|-sized projection) and is itself cached: both pagerank and
    # LPA seed their frontier from it
    deg = shared_edges(
        spark, sf_dir, "bipartite_deg", lambda: ed.select("src", "deg").distinct()
    )
    return ed, deg


def _pagerank_oracle() -> str:
    its = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        its.append(
            f"""it{i} AS (
  SELECT e.dst AS node,
         CAST({_TELEPORT} + ({_DAMP_NUM} * SUM(r.rank // e.deg)) // {_DAMP_DEN}
              AS BIGINT) AS rank
  FROM ed e JOIN {prev} r ON r.node = e.src
  GROUP BY 1
)"""
        )
        prev = f"it{i}"
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
r0 AS (SELECT src AS node, CAST({_R0} AS BIGINT) AS rank FROM deg),
{",".join(its)}
SELECT node, rank AS rank_e6 FROM {prev}
"""


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration damped PageRank in micro-unit fixed point:
    rank' = 150000 + (85 * sum_in(rank_src DIV deg_src)) DIV 100.
    The DataFrame loop unrolls into one Catalyst plan (join + groupBy per
    iteration); the oracle unrolls the same three iterations as CTEs."""
    ed, deg = _edges_deg(spark, sf_dir)
    return pagerank_iterations(ed, deg, _ITERS, npart=_graph_npart(spark, sf_dir))


def pagerank_iterations(
    ed: DataFrame, deg: DataFrame, iters: int, npart: int | None = None
) -> DataFrame:
    """The fixed-point iteration core over (src, dst, deg) edges and a
    (src, deg) out-degree table; exposed for property tests on arbitrary
    graphs.

    The per-iteration join carries a SHUFFLE_HASH hint on the rank
    frontier: only the |nodes|-sized frontier moves to the edge list's
    (reused) src partitioning and gets hash-built, with no sort on the
    edge side.  Without the hint, AQE sees the edge exchange finish
    first, measures it under the broadcast threshold at test SF, and
    broadcasts the EDGE LIST each iteration — exactly backwards at
    scale, where edges are the 100 TB side and the frontier is the only
    thing that may move.

    ``npart`` (r12): partition count of the cached edge relation.  Each
    round's aggregate leaves the frontier hashpartitioned by node at the
    session shuffle default; both join children then satisfy their
    distribution with MISMATCHED counts and EnsureRequirements
    re-shuffles to the larger side — the EDGE list (measured: one full
    edge Exchange per iteration).  Re-keying the node-sized frontier to
    ``npart`` costs one extra |nodes| exchange per round and keeps the
    edge side exchange-free end to end (guide §2.4: move the proxy,
    never the payload)."""
    ranks = deg.select(F.col("src").alias("node"), F.lit(_R0).cast("long").alias("rank"))
    for _ in range(iters):
        ranks = (
            ed.join(ranks.hint("shuffle_hash"), ed.src == ranks.node)
            .select(F.col("dst"), F.expr("rank DIV deg").alias("contrib"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(_TELEPORT)
                    + F.expr(f"({_DAMP_NUM} * sum(contrib)) DIV {_DAMP_DEN}")
                )
                .cast("long")
                .alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
        )
        if npart is not None:
            ranks = ranks.repartition(npart, F.col("node"))
    return ranks.select("node", F.col("rank").alias("rank_e6"))


# ---------------------------------------------------------------------------
# part co-purchase graph: triangles + degree distribution
# ---------------------------------------------------------------------------

_COPURCHASE_EDGES_DUCK = """
pe AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem),
e0 AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pe a JOIN pe b ON a.okey = b.okey AND a.p < b.p
)"""



# per-order sorted-set pair expansion, shared by the co-purchase edge
# builders (undirected, u < v) — one drifting copy would silently change
# which graph each operator sees
_PAIRS_UV_SQL = """
        explode(flatten(transform(ps, (x, i) ->
          transform(slice(ps, i + 2, size(ps) - i - 1),
                    y -> struct(x AS u, y AS v))))) AS e
        """


def _order_part_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(okey, sorted part set) — the one shuffle all co-purchase edge
    builders share."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str):
    """Undirected part co-purchase edges, oriented u < v (each edge once).

    collect_set per order replaces the (okey, p) distinct + self-join —
    one shuffle instead of three, and the pair expansion is a map-side
    array transform over the (small, sorted) per-order part set.  Orders
    with pathologically many parts would need a per-order cap or salting;
    TPC-H orders hold <= 7 lineitems."""

    def build() -> DataFrame:
        pairs = (
            _order_part_sets(spark, sf_dir)
            .selectExpr(_PAIRS_UV_SQL)
            .select("e.u", "e.v")
        )
        return pairs.distinct()

    return shared_edges(spark, sf_dir, "copurchase", build)


def _copurchase_deg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, degree) of the undirected co-purchase graph, cached like
    the edge list: the degree histogram, the triangle stats, and the
    clustering coefficient all consume it."""
    e0 = _copurchase_edges(spark, sf_dir)
    return shared_edges(
        spark,
        sf_dir,
        "copurchase_deg",
        lambda: (
            e0.select(F.col("u").alias("x"))
            .unionByName(e0.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count("*").cast("long").alias("degree"))
        ),
    )


@register(
    "graph_triangle_count",
    oracle=f"""
WITH {_COPURCHASE_EDGES_DUCK},
nodes AS (SELECT u AS x FROM e0 UNION SELECT v FROM e0)
SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*)
             FROM e0 e1
             JOIN e0 e2 ON e2.u = e1.v
             JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v) AS BIGINT) AS n_triangles
""",
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph: edges oriented
    u < v, wedges (u<v<w) from the e1.v = e2.u self-join, closed against
    the edge set.  Wedge volume is sum_v d_<(v)*d_>(v); the production
    orientation at 100 TB orders by (degree, id) instead of raw id, which
    caps per-node out-degree at ~sqrt(m) and hence wedges at O(m^1.5) —
    identical plan shape, different ordering key."""
    # the edge projection is tiny relative to lineitem (distinct pairs)
    # and arrives pre-materialized from the shared per-session cache
    # (shared_edges) — the three stat jobs here AND the degree-histogram
    # query all start from the same checkpointed blocks.  At 100 TB the
    # edge list is materialized to parquet once and the stats share that
    # scan instead.
    e0 = _copurchase_edges(spark, sf_dir)
    n_edges = e0.count()
    n_nodes = _copurchase_deg(spark, sf_dir).count()
    # adjacency-intersection ("compact forward") instead of the
    # wedge-join: |N_>(u) ∩ N_>(v)| summed per edge.  The wedge join
    # materializes sum_v d_<(v)*d_>(v) rows through a shuffle (49M at
    # sf0.1, 7.3s); the intersect form moves only the 1x edge list
    # with array payloads through two hash joins and intersects
    # JVM-side (measured 1.5x faster here, and the gap widens with
    # degree — shuffle volume stays O(m), not O(sum d^2))
    # forward-adjacency lists, cached alongside the edge list: both the
    # triangle count and the clustering coefficient intersect the same
    # sorted neighbor arrays, so the collect_list aggregate runs once
    # per session (shared_edges) instead of once per query
    adj = shared_edges(
        spark,
        sf_dir,
        "copurchase_adj",
        lambda: e0.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs")),
    )
    au = adj.select("u", F.col("nbrs").alias("nu"))
    av = adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv"))
    tri = (
        e0.join(au, "u")
        .join(av, "v")
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        .agg(F.sum("c").alias("t"))
        .collect()[0]["t"]
    ) or 0
    return spark.createDataFrame(
        [(n_nodes, n_edges, tri)], "n_nodes long, n_edges long, n_triangles long"
    )


@register(
    "graph_degree_histogram",
    oracle=f"""
WITH {_COPURCHASE_EDGES_DUCK},
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0)
  GROUP BY 1
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1
""",
    tags=("graph",),
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph: two partial-agg
    groupBys (node degree, then histogram) — the skew diagnostic you run
    BEFORE the triangle/PageRank passes to pick salting and orientation
    thresholds."""
    deg = _copurchase_deg(spark, sf_dir)
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling) on the SUPPORT-THRESHOLDED
# co-purchase graph: edges are part pairs co-purchased in >= _KCORE_SUP
# distinct orders (the frequent-itemset flavor — the raw co-purchase
# graph is so dense no peeling ever happens).  Peeling repeatedly drops
# nodes of degree < k; the fixed point is the maximal subgraph where
# every node keeps >= k neighbors, the standard community-density filter
# before expensive per-community passes.
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_SUP = 2
# fixed unrolled rounds; >= observed fixpoint depth at every test SF
# (11 at sf0.01) and asserted convergent in tests/test_sessions_graph_linkage.py
_KCORE_ITERS = 12

_KCORE_EDGES_DUCK = f"""
pe AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.p AS u, b.p AS v
  FROM pe a JOIN pe b ON a.okey = b.okey AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= {_KCORE_SUP}
),
-- MATERIALIZED: sym/it{{i}} are each referenced twice per peeling round;
-- default CTE inlining would expand the tree exponentially in rounds
sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0)"""


def _kcore_oracle() -> str:
    its = []
    prev = "rem0"
    for i in range(1, _KCORE_ITERS + 1):
        its.append(
            f"""it{i} AS MATERIALIZED (
  SELECT s.src AS node FROM sym s
  JOIN {prev} r1 ON r1.node = s.src
  JOIN {prev} r2 ON r2.node = s.dst
  GROUP BY 1 HAVING COUNT(*) >= {_KCORE_K}
)"""
        )
        prev = f"it{i}"
    return f"""
WITH {_KCORE_EDGES_DUCK},
rem0 AS (SELECT DISTINCT src AS node FROM sym),
{",".join(its)}
SELECT s.src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM sym s
JOIN {prev} r1 ON r1.node = s.src
JOIN {prev} r2 ON r2.node = s.dst
GROUP BY 1
"""


def _support_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v) part pairs (u < v) co-purchased in >= _KCORE_SUP orders.
    Same one-shuffle per-order pair expansion as _copurchase_edges, but
    keeping multiplicity so the groupBy counts order support."""
    pairs = _order_part_sets(spark, sf_dir).selectExpr(_PAIRS_UV_SQL).select("e.u", "e.v")
    return (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _KCORE_SUP)
        .select("u", "v")
    )


def kcore_members(sym: DataFrame, k: int, iters: int) -> DataFrame:
    """Peeling core over a symmetrized (src, dst) edge list: up to
    ``iters`` rounds of degree-filter, stopping early at the fixed point
    (identical to running all rounds — peeling a fixed point is the
    identity, so the fixed-round oracle agrees).  ``rem`` is referenced
    twice per round, so each round is truncated with
    ``localCheckpoint`` — without it the logical plan DOUBLES per
    iteration (the CC lesson, operators/graph.py).  Runs Spark actions
    internally (one count per round) — an algorithm, not a lazy
    transform.  Exposed for the convergence property test."""
    rem = sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n_rem = rem.count()
    for _ in range(iters):
        rem2 = (
            sym.join(rem.withColumnRenamed("node", "src"), "src")
            .join(rem.selectExpr("node AS dst"), "dst")
            .groupBy("src")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("src").alias("node"))
            .localCheckpoint()
        )
        n2 = rem2.count()
        rem = rem2
        if n2 == n_rem:
            break
        n_rem = n2
    return (
        sym.join(rem.withColumnRenamed("node", "src"), "src")
        .join(rem.selectExpr("node AS dst"), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("long").alias("core_degree"))
    )


@register("graph_kcore_members", oracle=_kcore_oracle(), tags=("graph", "iterative"))
def graph_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KCORE_K}-core of the support-{_KCORE_SUP} co-purchase graph:
    fixed {_KCORE_ITERS}-round peeling (>= the observed fixpoint depth at
    every test SF; the oracle unrolls identical rounds as CTEs), emitting
    surviving nodes with their within-core degree.  The edge list is
    persisted across rounds — each round is join+join+partial-agg on the
    cached (small relative to lineitem) edge relation; at 100 TB the
    edges materialize to bucketed parquet once and every round's joins
    co-locate on the bucket key, so only the degree partial-agg
    exchanges data."""
    def build_sym() -> DataFrame:
        # r12: symmetrize by exploding a 2-element array (one reference
        # to the support-edge subtree, so the pre-union localCheckpoint
        # and its materialization round-trip go away — same reshape as
        # _edges_deg, guide §2.4)
        return (
            _support_edges(spark, sf_dir)
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
                        F.struct(F.col("v").alias("src"), F.col("u").alias("dst")),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
        )

    sym = shared_edges(spark, sf_dir, "kcore_sym", build_sym, partition_on="src")
    return kcore_members(sym, _KCORE_K, _KCORE_ITERS)


# ---------------------------------------------------------------------------
# synchronous label propagation (community detection)
# ---------------------------------------------------------------------------

_LP_ROUNDS = 2


def _lpa_oracle() -> str:
    its = []
    prev = "l0"
    for i in range(1, _LP_ROUNDS + 1):
        its.append(
            f"""c{i} AS (
  SELECT e.dst AS node, l.lbl AS lbl, COUNT(*) AS c
  FROM ed e JOIN {prev} l ON l.node = e.src
  GROUP BY 1, 2
),
l{i} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
)"""
        )
        prev = f"l{i}"
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
ed AS (SELECT src, dst FROM edges),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
{",".join(its)}
SELECT node, lbl AS community,
       CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
FROM {prev}
"""


# argmax packing base for lpa_iterations: labels are node ids
# (custkey, or suppkey + _SUPP_BASE), well under 2^32 at any TPC-H
# scale factor in range (custkey tops out ~1.5e10 only past sf100k);
# counts are per-node neighbor-label multiplicities, under 2^31 for
# any graph whose max degree fits an INT.  c * 2^32 stays inside
# BIGINT for c < 2^31.
_LPA_PACK = 1 << 32


def lpa_iterations(
    ed: DataFrame, deg: DataFrame, rounds: int, npart: int | None = None
) -> DataFrame:
    """The synchronous label-propagation core over (src, dst) edges:
    per round, every node adopts its neighbors' most frequent label
    (ties -> smallest).  SHUFFLE_HASH on the frontier, same rationale as
    pagerank_iterations: move |nodes| labels, never the edge list.
    Exposed (un-checkpointed) so the plan audit can assert the loop's
    join strategy directly.

    r12: the per-round argmax packs (count, label) into ONE BIGINT,
    k = c * 2^32 + (2^32 - 1 - lbl), so max(k) == (max c, then min lbl)
    — identical to the previous max(struct(c, -lbl)) and to the oracle's
    row_number() ORDER BY c DESC, lbl ASC.  A LONG max runs as a
    codegen'd HashAggregate; the struct max fell to SortAggregate with a
    full Sort of the (dst, lbl) pair table on BOTH sides of its exchange
    per round — at 100 TB that is two n·log n passes over an |E|-sized
    relation per round for what is a hash rollup (guide §1.2).  Bounds
    documented above; measured 12.5 -> 10.9 CPU-s for the 2-round loop
    at sf0.1."""
    lbl = deg.select(F.col("src").alias("node"), F.col("src").alias("lbl"))
    for _ in range(rounds):
        lbl = (
            ed.join(lbl.hint("shuffle_hash"), ed.src == lbl.node)
            .groupBy(F.col("dst"), F.col("lbl"))
            .agg(F.count("*").alias("c"))
            .groupBy("dst")
            .agg(
                F.max(
                    F.col("c") * F.lit(_LPA_PACK)
                    + (F.lit(_LPA_PACK - 1) - F.col("lbl"))
                ).alias("k")
            )
            .select(
                F.col("dst").alias("node"),
                (F.lit(_LPA_PACK - 1) - F.col("k") % F.lit(_LPA_PACK)).alias("lbl"),
            )
        )
        if npart is not None:
            # re-key the node-sized frontier to the edge partitioning —
            # same rationale as pagerank_iterations' npart
            lbl = lbl.repartition(npart, F.col("node"))
    return lbl


@register("graph_label_propagation", oracle=_lpa_oracle(), tags=("graph", "iterative"))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation ({_LP_ROUNDS} rounds) on the
    symmetrized customer<->supplier graph: every node starts labeled
    with its own id; each round it adopts the most frequent label among
    its neighbors, ties broken toward the SMALLEST label — fully
    deterministic, no randomized tie-breaks.  The per-round argmax is a
    single groupBy(node, label) count followed by a max(struct(count,
    -label)) partial-aggregating argmax (no window, no second shuffle
    beyond the count's).  Same scale shape as graph_pagerank: the edge
    list is materialized src-partitioned once and every round joins
    against the small (node, label) frontier.  Returns each node's final
    community and that community's size.  Reference analogue: none
    (beyond-reference graph extension alongside PageRank/k-core)."""
    ed, deg = _edges_deg(spark, sf_dir)
    lbl = lpa_iterations(ed, deg, _LP_ROUNDS, npart=_graph_npart(spark, sf_dir))
    # community sizes as a |communities|-row aggregate broadcast back:
    # a window partitioned by the CONVERGED label would send the largest
    # community's whole membership to one task (labels concentrate —
    # that is what LPA does).  Checkpoint the converged frontier first:
    # both the size rollup and the final join consume it, and without
    # truncation Catalyst re-runs the entire propagation loop for the
    # sizes branch (no CSE across consumers — ARCHITECTURE.md pattern).
    lbl = lbl.localCheckpoint()
    sizes = lbl.groupBy("lbl").agg(F.count("*").cast("long").alias("community_size"))
    return lbl.join(F.broadcast(sizes), "lbl").select(
        "node",
        F.col("lbl").alias("community"),
        "community_size",
    )


@register(
    "graph_clustering_coefficient",
    oracle=f"""
WITH {_COPURCHASE_EDGES_DUCK},
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0)
  GROUP BY 1
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e0 e1
  JOIN e0 e2 ON e2.u = e1.v
  JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
),
pert AS (
  SELECT a AS x FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
tcnt AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM pert GROUP BY 1)
SELECT d.x AS node,
       CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
       CAST(d.d * (d.d - 1) // 2 AS BIGINT) AS n_wedges,
       CAST(CASE WHEN d.d >= 2
                 THEN (2000000 * COALESCE(t.t, 0)) // (d.d * (d.d - 1))
                 ELSE 0 END AS BIGINT) AS cc_e6
FROM deg d LEFT JOIN tcnt t ON t.x = d.x
""",
    tags=("graph",),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient on the co-purchase graph:
    cc(v) = 2*tri(v) / (d(v)*(d(v)-1)), emitted in exact micro-units
    (integer division — no float anywhere, so the hash pins every
    node).  Triangles attribute to all three corners: the oriented
    adjacency-intersect (the triangle_count plan) EXPLODES the
    intersection members instead of counting them, yielding one (a,b,c)
    row per triangle — a deliberate O(#triangles) materialization,
    which is the price of per-node attribution at any scale — then one
    partial-agg count per corner.  Edges come pre-materialized from the
    shared per-session cache (shared_edges), so this query starts at
    the intersect.  The graph feature every community/quality pipeline
    computes before sampling hubs.  Reference analogue: none
    (beyond-reference graph extension)."""
    e0 = _copurchase_edges(spark, sf_dir)
    deg = _copurchase_deg(spark, sf_dir).withColumnRenamed("degree", "d")
    # forward-adjacency lists, cached alongside the edge list: both the
    # triangle count and the clustering coefficient intersect the same
    # sorted neighbor arrays, so the collect_list aggregate runs once
    # per session (shared_edges) instead of once per query
    adj = shared_edges(
        spark,
        sf_dir,
        "copurchase_adj",
        lambda: e0.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs")),
    )
    au = adj.select("u", F.col("nbrs").alias("nu"))
    av = adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv"))
    tri = (
        e0.join(au, "u")
        .join(av, "v")
        .select(
            F.col("u").alias("a"),
            F.col("v").alias("b"),
            F.explode(F.array_intersect("nu", "nv")).alias("c"),
        )
    )
    pert = (
        tri.select(F.col("a").alias("x"))
        .unionByName(tri.select(F.col("b").alias("x")))
        .unionByName(tri.select(F.col("c").alias("x")))
    )
    tcnt = pert.groupBy("x").agg(F.count("*").cast("long").alias("t"))
    return (
        deg.join(tcnt, "x", "left")
        .select(
            F.col("x").alias("node"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr("CAST(d * (d - 1) DIV 2 AS BIGINT)").alias("n_wedges"),
            F.expr(
                "CAST(IF(d >= 2, (2000000 * coalesce(t, 0)) DIV (d * (d - 1)), 0)"
                " AS BIGINT)"
            ).alias("cc_e6"),
        )
    )


# ---------------------------------------------------------------------------
# multi-source BFS distances (frontier expansion, bounded rounds)
# ---------------------------------------------------------------------------

_BFS_SEEDS = (1, 2, 3, 4, 5)  # customer node ids (custkeys start at 1)
_BFS_ROUNDS = 3


def _bfs_oracle() -> str:
    seeds = ", ".join(f"({s}, 0)" for s in _BFS_SEEDS)
    its = []
    prev = "d0"
    for i in range(1, _BFS_ROUNDS + 1):
        its.append(
            f"""d{i} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, {i} AS dist
    FROM edges e JOIN {prev} p ON e.src = p.node AND p.dist = {i - 1}
  ) GROUP BY node
)"""
        )
        prev = f"d{i}"
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
d0 AS (SELECT * FROM (VALUES {seeds}) t(node, dist)),
{",".join(its)}
SELECT node, CAST(dist AS BIGINT) AS dist FROM {prev}
"""


@register("graph_bfs_distances", oracle=_bfs_oracle(), tags=("graph", "iterative"))
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: hop distance from a seed set, {_BFS_ROUNDS}
    frontier rounds (graph/reachability primitive the pagerank/LPA family
    lacked).  Per round, ONLY the newly-reached frontier joins the edge
    list (SHUFFLE_HASH on the frontier side, same discipline as
    pagerank_iterations: the 100 TB edge list never broadcasts and keeps
    its cached src partitioning); visited nodes are removed by a
    broadcast-able anti-join against the (|reached|-sized) distance
    table.  Frontier-only expansion makes each round's cost proportional
    to the frontier boundary, not the graph."""
    ed, _deg = _edges_deg(spark, sf_dir)
    seeds = [(int(s), 0) for s in _BFS_SEEDS]
    dist = spark.createDataFrame(seeds, "node BIGINT, dist BIGINT")
    frontier = dist
    for r in range(1, _BFS_ROUNDS + 1):
        reached = (
            ed.join(frontier.hint("shuffle_hash"), ed.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = reached.join(dist, "node", "left_anti").select(
            "node", F.lit(r).cast("long").alias("dist")
        )
        # checkpoint the (small) per-round frontier: round r+1's plan
        # would otherwise re-derive every prior round's expansion
        frontier = new.localCheckpoint()
        dist = dist.unionByName(frontier)
    return dist


# ---------------------------------------------------------------------------
# weakly-connected components on a sparse transaction subgraph
# ---------------------------------------------------------------------------

# every-997th-order subgraph: hub suppliers glue denser samples into
# one giant component (mod 37 still collapsed at sf0.01), so the sample
# is thinned until mean supplier degree < 1 and the subgraph genuinely
# fragments; deterministic at every SF
_WCC_MOD = 997

_WCC_EDGE_SQL = f"""
SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey % {_WCC_MOD} = 0
"""

_WCC_ORACLE = f"""
WITH RECURSIVE e0 AS ({_WCC_EDGE_SQL}),
edges AS (SELECT src AS a, dst AS b FROM e0
          UNION ALL SELECT dst AS a, src AS b FROM e0),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(COUNT(CASE WHEN node < {_SUPP_BASE} THEN 1 END) AS BIGINT)
         AS n_customers,
       CAST(COUNT(CASE WHEN node >= {_SUPP_BASE} THEN 1 END) AS BIGINT)
         AS n_suppliers
FROM labeled GROUP BY component
"""


@register("graph_wcc_components", oracle=_WCC_ORACLE, tags=("graph", "iterative"))
def graph_wcc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly-connected components of the sparse (every-{_WCC_MOD}th
    order) customer-supplier subgraph, summarized per component (size +
    per-side counts).  Reuses the hash-min propagation operator the
    dedup path uses (operators/graph.py connected_components: O(diameter)
    checkpointed rounds, each one frontier join — the same CC that turns
    near-dup pairs into clusters labels any graph).  The oracle is exact
    reachability (recursive CTE), so the propagation's fixpoint itself
    is value-checked."""
    from copperhead_spark.operators.graph import connected_components

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.filter(F.col("o_orderkey") % _WCC_MOD == 0)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(_SUPP_BASE)).alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e0.select(F.col("src").alias("node"))
        .unionByName(e0.select(F.col("dst").alias("node")))
        .distinct()
    )
    cc = connected_components(nodes, e0, node_col="node", src_col="src", dst_col="dst")
    return cc.groupBy("component").agg(
        F.count("*").alias("n_nodes"),
        F.count(F.when(F.col("node") < _SUPP_BASE, 1)).alias("n_customers"),
        F.count(F.when(F.col("node") >= _SUPP_BASE, 1)).alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities on the directed customer->supplier graph
# ---------------------------------------------------------------------------

_HITS_ITERS = 2
_HITS_SCALE = 1_000_000


def _hits_oracle() -> str:
    steps = []
    prev_h = "h0"
    for i in range(1, _HITS_ITERS + 1):
        steps.append(
            f"""a{i}r AS (
  SELECT e.dst AS node, CAST(SUM(h.score) AS BIGINT) AS raw
  FROM e0 e JOIN {prev_h} h ON e.src = h.node GROUP BY 1
),
a{i} AS (
  SELECT node, CAST((raw * {_HITS_SCALE})
                    // CAST(SUM(raw) OVER () AS BIGINT) AS BIGINT) AS score
  FROM a{i}r
),
h{i}r AS (
  SELECT e.src AS node, CAST(SUM(a.score) AS BIGINT) AS raw
  FROM e0 e JOIN a{i} a ON e.dst = a.node GROUP BY 1
),
h{i} AS (
  SELECT node, CAST((raw * {_HITS_SCALE})
                    // CAST(SUM(raw) OVER () AS BIGINT) AS BIGINT) AS score
  FROM h{i}r
)"""
        )
        prev_h = f"h{i}"
    last = _HITS_ITERS
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
h0 AS (SELECT DISTINCT src AS node, CAST({_HITS_SCALE} AS BIGINT) AS score FROM e0),
{",".join(steps)}
SELECT 'hub' AS side, node, score AS score_e6 FROM h{last}
UNION ALL
SELECT 'auth' AS side, node, score AS score_e6 FROM a{last}
"""


@register("graph_hits", oracle=_hits_oracle(), tags=("graph", "iterative"))
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities ({_HITS_ITERS} iterations) on the DIRECTED
    customer->supplier purchase graph: authority(s) = sum of hub scores
    of buyers, hub(c) = sum of authority scores of suppliers bought
    from, each half-step renormalized to {_HITS_SCALE} total via exact
    integer division, so both engines replay the arithmetic bit-for-bit
    (the oracle unrolls the same half-steps as CTEs with the identical
    `// CAST(SUM(raw) OVER () AS BIGINT)` normalizer).

    Scale design: BOTH half-steps join on the cached symmetrized edge
    relation's src key (the forward rows src<{_SUPP_BASE} are cust->supp
    for the authority update; the reversed rows are the hub update's
    dst-join re-expressed as a src-join), so every iteration reuses the
    shared edge cache's src hash partitioning — no per-iteration edge
    Exchange, only the node-sized frontier moves (SHUFFLE_HASH hint, as
    graph_pagerank).  The normalizer is the GraphX pattern: a full
    partial-aggregate reduction whose single scalar crosses the driver
    per half-step (same O(k)-rows-per-iteration discipline as
    kmeans_update_step); each raw-score relation is localCheckpoint-ed
    first so the normalize pass re-reads node-sized blocks, not the
    join lineage.  Headroom: raw <= n_customers * {_HITS_SCALE}, so the
    *{_HITS_SCALE} fixed-point multiply stays inside BIGINT up to ~9e6
    hub nodes per authority; beyond that drop the scale to 1e3.

    Reference analogue: none (graph analytics are beyond-reference
    surface, like graph_pagerank)."""
    ed, _deg = _edges_deg(spark, sf_dir)
    fwd = ed.filter(F.col("src") < _SUPP_BASE).select("src", "dst")
    rev = ed.filter(F.col("src") >= _SUPP_BASE).select("src", "dst")
    hubs = (
        fwd.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(_HITS_SCALE).cast("long").alias("score"))
    )

    def _half(edges: DataFrame, frontier: DataFrame) -> DataFrame:
        raw = (
            edges.join(frontier.hint("shuffle_hash"), edges.src == frontier.node)
            .groupBy(F.col("dst").alias("out_node"))
            .agg(F.sum("score").cast("long").alias("raw"))
            .localCheckpoint()
        )
        total = raw.agg(F.sum("raw")).collect()[0][0]
        return raw.select(
            F.col("out_node").alias("node"),
            F.expr(f"(raw * {_HITS_SCALE}) DIV {total}").cast("long").alias("score"),
        )

    auth = None
    for _ in range(_HITS_ITERS):
        auth = _half(fwd, hubs)
        hubs = _half(rev, auth)
    return hubs.select(
        F.lit("hub").alias("side"), "node", F.col("score").alias("score_e6")
    ).unionByName(
        auth.select(
            F.lit("auth").alias("side"), "node", F.col("score").alias("score_e6")
        )
    )


# ---------------------------------------------------------------------------
# item-item co-purchase recommender: top-k similar parts
# ---------------------------------------------------------------------------

_REC_TOPK = 3


_REC_ORACLE = f"""
WITH pe AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem),
cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM pe GROUP BY 1),
co AS (
  SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS cooc
  FROM pe a JOIN pe b ON a.okey = b.okey AND a.p < b.p
  GROUP BY 1, 2
),
sym AS (
  SELECT u AS item, v AS neighbor, cooc FROM co
  UNION ALL
  SELECT v AS item, u AS neighbor, cooc FROM co
),
scored AS (
  SELECT s.item, s.neighbor, s.cooc,
         CAST((s.cooc * s.cooc * 1000000) // (ci.c * cn.c) AS BIGINT) AS score_e6
  FROM sym s
  JOIN cnt ci ON s.item = ci.p
  JOIN cnt cn ON s.neighbor = cn.p
)
SELECT item, neighbor, cooc, score_e6, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY item ORDER BY score_e6 DESC, cooc DESC, neighbor ASC
  ) AS rn FROM scored
) WHERE rn <= {_REC_TOPK}
"""


@register("rec_copurchase_topk", oracle=_REC_ORACLE, tags=("graph", "recommender"))
def rec_copurchase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for every part, the top-{_REC_TOPK}
    most-similar parts by squared-cosine over order co-occurrence,
    score_e6 = cooc^2 * 1e6 DIV (n_orders(item) * n_orders(neighbor)) —
    exact integer fixed point, so rankings are bit-reproducible.

    Scale design: the pair space is expanded per-order from the SAME
    sorted part-set relation the triangle/copurchase family shares
    (one groupBy(okey) shuffle, then a map-side array transform —
    sum-of-squared-basket-sizes pairs, never |items|^2), and the
    weighted pair counts + per-part order frequencies are cached
    per-session like every other edge relation (shared_edges).  The
    frequency table (one row per part) is broadcast to the pair
    relation — two broadcast hash joins, zero extra shuffles of the
    pair list; at vocabularies beyond broadcast range the same plan
    falls back to shuffle joins on item/neighbor.  Top-k per item is a
    window over the item's neighbor list (bounded by basket expansion).

    Reference analogue: none (recommender co-occurrence is
    beyond-reference, LLM-pipeline-adjacent surface: the same shape
    scores document-domain affinity from co-citation)."""
    pairs_w = shared_edges(
        spark,
        sf_dir,
        "copurchase_w",
        lambda: (
            _order_part_sets(spark, sf_dir)
            .selectExpr(_PAIRS_UV_SQL)
            .groupBy(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
            .agg(F.count("*").cast("long").alias("cooc"))
        ),
    )
    cnt = shared_edges(
        spark,
        sf_dir,
        "copurchase_cnt",
        lambda: (
            _order_part_sets(spark, sf_dir)
            .selectExpr("explode(ps) AS p")
            .groupBy("p")
            .agg(F.count("*").cast("long").alias("c"))
        ),
    )
    sym = pairs_w.select(
        F.col("u").alias("item"), F.col("v").alias("neighbor"), "cooc"
    ).unionByName(
        pairs_w.select(F.col("v").alias("item"), F.col("u").alias("neighbor"), "cooc")
    )
    scored = (
        sym.join(
            F.broadcast(cnt.select(F.col("p"), F.col("c").alias("ci"))),
            F.col("item") == F.col("p"),
        )
        .drop("p")
        .join(
            F.broadcast(cnt.select(F.col("p"), F.col("c").alias("cn"))),
            F.col("neighbor") == F.col("p"),
        )
        .select(
            "item",
            "neighbor",
            "cooc",
            F.expr("(cooc * cooc * 1000000) DIV (ci * cn)")
            .cast("long")
            .alias("score_e6"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("score_e6").desc(), F.col("cooc").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _REC_TOPK)
        .select("item", "neighbor", "cooc", "score_e6", F.col("rn").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Bellman-Ford weighted shortest paths (delta-frontier relaxation)
# ---------------------------------------------------------------------------

_BF_ROUNDS = 4
_BF_SEED_MOD = 100
# deterministic synthetic edge weight in [1, 5]
_BF_W = "1 + (src + dst) % 5"


def _bf_oracle() -> str:
    its = []
    prev = "d0"
    for i in range(1, _BF_ROUNDS + 1):
        its.append(
            f"""d{i} AS (
  SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.dist + e.w AS dist
    FROM ed e JOIN {prev} p ON e.src = p.node
  ) GROUP BY node
)"""
        )
        prev = f"d{i}"
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
ed AS (SELECT src, dst, CAST({_BF_W} AS BIGINT) AS w FROM edges),
d0 AS (
  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
  FROM e0 WHERE src % {_BF_SEED_MOD} = 0
),
{",".join(its)}
SELECT node, dist FROM {prev}
"""


@register("graph_bellman_ford", oracle=_bf_oracle(), tags=("graph", "iterative"))
def graph_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source (multi-seed) shortest paths: {_BF_ROUNDS}
    Bellman-Ford rounds over the symmetrized purchase graph with a
    deterministic integer weight (1 + (src+dst) % 5) — the weighted
    complement to graph_bfs_distances' hop counts.

    Scale design: DELTA relaxation — each round joins the edge list
    against only the nodes whose distance improved last round (provably
    equivalent to textbook relax-everything: a non-improved node's
    relaxations were already merged the round after it last improved),
    so round cost tracks the moving frontier, not the reached set.  The
    frontier side carries the SHUFFLE_HASH hint and the edge relation
    comes src-partitioned from the shared per-session cache; each
    round's improved set is localCheckpoint-ed so plan lineage stays
    flat.  The oracle replays textbook Bellman-Ford as unrolled CTEs;
    equality of the two schedules is itself part of what the value hash
    checks.

    Reference analogue: none (graph surface beyond the reference, like
    the rest of this family)."""
    ed, _deg = _edges_deg(spark, sf_dir)
    edw = ed.selectExpr("src", "dst", f"CAST({_BF_W} AS BIGINT) AS w")
    dist = (
        edw.filter(
            (F.col("src") % _BF_SEED_MOD == 0) & (F.col("src") < _SUPP_BASE)
        )
        .select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint()
    )
    frontier = dist
    for _ in range(_BF_ROUNDS):
        cand = (
            edw.join(frontier.hint("shuffle_hash"), edw.src == frontier.node)
            .select(F.col("dst").alias("cnode"), (F.col("dist") + F.col("w")).alias("cdist"))
            .groupBy("cnode")
            .agg(F.min("cdist").alias("cdist"))
        )
        improved = (
            cand.join(dist, cand.cnode == dist.node, "left")
            .filter(F.col("node").isNull() | (F.col("cdist") < F.col("dist")))
            .select(F.col("cnode").alias("node"), F.col("cdist").alias("dist"))
            .localCheckpoint()
        )
        frontier = improved
        dist = (
            dist.unionByName(improved)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return dist


# ---------------------------------------------------------------------------
# link prediction: common-neighbor Jaccard on a hub-suppressed subgraph
# ---------------------------------------------------------------------------

_LP_MOD = 13
_LP_DEGCAP = 64
_LP_TOPK = 20

_LP_ORACLE = f"""
WITH pe AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS p
  FROM lineitem WHERE l_orderkey % {_LP_MOD} = 0
),
e0 AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pe a JOIN pe b ON a.okey = b.okey AND a.p < b.p
),
deg0 AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM
  (SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0) GROUP BY 1
),
keep AS (SELECT x FROM deg0 WHERE d <= {_LP_DEGCAP}),
sub AS (
  SELECT u, v FROM e0
  WHERE u IN (SELECT x FROM keep) AND v IN (SELECT x FROM keep)
),
sym AS (SELECT u AS w, v AS nbr FROM sub UNION ALL SELECT v AS w, u AS nbr FROM sub),
degs AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1),
cn AS (
  SELECT a.nbr AS u, b.nbr AS v, CAST(COUNT(*) AS BIGINT) AS cn
  FROM sym a JOIN sym b ON a.w = b.w AND a.nbr < b.nbr
  GROUP BY 1, 2
),
cand AS (
  SELECT cn.u, cn.v, cn.cn,
         CAST((cn.cn * 1000000) // (du.d + dv.d - cn.cn) AS BIGINT) AS jaccard_e6
  FROM cn
  JOIN degs du ON cn.u = du.w
  JOIN degs dv ON cn.v = dv.w
  LEFT JOIN sub e ON cn.u = e.u AND cn.v = e.v
  WHERE e.u IS NULL
)
SELECT u, v, cn, jaccard_e6 FROM cand
ORDER BY jaccard_e6 DESC, u ASC, v ASC LIMIT {_LP_TOPK}
"""


@register("graph_link_prediction", oracle=_LP_ORACLE, tags=("graph", "recommender"))
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor Jaccard: on the sparse
    (every-{_LP_MOD}th order) co-purchase subgraph with hub nodes
    (degree > {_LP_DEGCAP}) suppressed, rank NON-adjacent part pairs by
    |N(u) & N(v)| / |N(u) | N(v)| in exact 1e-6 fixed point — the
    "customers also bought these together-able" candidate generator.

    Scale design: hub suppression IS the scale story — common-neighbor
    pair expansion is sum-of-degree-squares over intermediate nodes, so
    dropping the heavy tail (every production link predictor does)
    bounds the quadratic term by the cap, and the expansion itself is
    the per-node sorted-neighbor-set array transform (map-side, one
    groupBy(w) shuffle) shared with the co-purchase family.  Candidate
    filtering is a broadcast-able anti-join against the (pruned) edge
    list; degrees broadcast; top-k compiles to TakeOrderedAndProject.

    Reference analogue: the dR-overlap removal shape (P12) inverted —
    instead of removing near pairs, surfacing absent-but-similar
    pairs."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % _LP_MOD == 0)
    pe = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("p")
    ).distinct()
    e0 = (
        pe.groupBy("okey")
        .agg(F.sort_array(F.collect_set("p")).alias("ps"))
        .selectExpr(_PAIRS_UV_SQL)
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint()
    )
    deg0 = (
        e0.select(F.col("u").alias("x"))
        .unionByName(e0.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("long").alias("d"))
    )
    keep = deg0.filter(F.col("d") <= _LP_DEGCAP).select("x")
    sub = (
        e0.join(F.broadcast(keep.withColumnRenamed("x", "u")), "u")
        .join(F.broadcast(keep.withColumnRenamed("x", "v")), "v")
        .select("u", "v")
        .localCheckpoint()
    )
    sym = sub.select(F.col("u").alias("w"), F.col("v").alias("nbr")).unionByName(
        sub.select(F.col("v").alias("w"), F.col("u").alias("nbr"))
    )
    degs = sym.groupBy("w").agg(F.count("*").cast("long").alias("d"))
    cn = (
        sym.groupBy("w")
        .agg(F.sort_array(F.collect_set("nbr")).alias("ps"))
        .selectExpr(_PAIRS_UV_SQL)
        .groupBy(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .agg(F.count("*").cast("long").alias("cn"))
    )
    cand = (
        cn.join(F.broadcast(degs.selectExpr("w AS u", "d AS du")), "u")
        .join(F.broadcast(degs.selectExpr("w AS v", "d AS dv")), "v")
        .join(sub, ["u", "v"], "left_anti")
        .selectExpr(
            "u",
            "v",
            "cn",
            "CAST((cn * 1000000) DIV (du + dv - cn) AS BIGINT) AS jaccard_e6",
        )
    )
    return cand.orderBy(
        F.col("jaccard_e6").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(_LP_TOPK)


# ---------------------------------------------------------------------------
# personalized PageRank from a sparse seed set
# ---------------------------------------------------------------------------

_PPR_SEED_MOD = 50
_PPR_ITERS = 3


def _ppr_oracle() -> str:
    its = []
    prev = "r0"
    for i in range(1, _PPR_ITERS + 1):
        its.append(
            f"""it{i} AS (
  SELECT node, CAST(SUM(r) AS BIGINT) AS rank FROM (
    SELECT e.dst AS node,
           CAST(({_DAMP_NUM} * SUM(r.rank // e.deg)) // {_DAMP_DEN} AS BIGINT) AS r
    FROM ed e JOIN {prev} r ON r.node = e.src
    GROUP BY e.dst
    UNION ALL
    SELECT node, CAST({_TELEPORT} AS BIGINT) AS r FROM seeds
  ) GROUP BY node
)"""
        )
        prev = f"it{i}"
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
seeds AS (
  SELECT src AS node FROM deg
  WHERE src % {_PPR_SEED_MOD} = 0 AND src < {_SUPP_BASE}
),
r0 AS (SELECT node, CAST({_R0} AS BIGINT) AS rank FROM seeds),
{",".join(its)}
SELECT node, rank AS ppr_e6 FROM {prev}
"""


@register("graph_personalized_pagerank", oracle=_ppr_oracle(), tags=("graph", "iterative"))
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: random walks restart at a SEED SET (every
    {_PPR_SEED_MOD}th customer), not uniformly — the
    recommendations/trust-propagation variant.  Same exact micro-unit
    arithmetic as graph_pagerank (rank' = 0.85-damped in-sum, integer
    floor division), but teleport mass lands only on seeds, expressed as
    a union of damped-contribution rows and per-seed teleport rows
    folded by one sum.

    Scale design: the rank table is SPARSE — iteration 0 holds only the
    seeds, and nodes outside the walk's reach never materialize a row —
    so the per-iteration frontier join moves |reached|, not |V|, rows
    (this is why PPR, unlike global PageRank, serves interactive
    queries on 100 TB graphs).  Edges come from the shared per-session
    cache, src-partitioned once; the frontier carries the SHUFFLE_HASH
    hint for the same AQE reason as graph_pagerank.

    Reference analogue: none (graph surface beyond the reference,
    beside pagerank/HITS/BFS)."""
    ed, deg = _edges_deg(spark, sf_dir)
    seeds = (
        deg.filter(
            (F.col("src") % _PPR_SEED_MOD == 0) & (F.col("src") < _SUPP_BASE)
        )
        .select(F.col("src").alias("node"))
        .localCheckpoint()
    )
    ranks = seeds.select("node", F.lit(_R0).cast("long").alias("rank"))
    tele = seeds.select("node", F.lit(_TELEPORT).cast("long").alias("r"))
    for _ in range(_PPR_ITERS):
        damped = (
            ed.join(ranks.hint("shuffle_hash"), ed.src == ranks.node)
            .select(F.col("dst"), F.expr("rank DIV deg").alias("contrib"))
            .groupBy("dst")
            .agg(
                F.expr(f"CAST(({_DAMP_NUM} * sum(contrib)) DIV {_DAMP_DEN} AS BIGINT)")
                .alias("r")
            )
            .select(F.col("dst").alias("node"), "r")
        )
        ranks = (
            damped.unionByName(tele)
            .groupBy("node")
            .agg(F.sum("r").cast("long").alias("rank"))
        )
    return ranks.select("node", F.col("rank").alias("ppr_e6"))


# ---------------------------------------------------------------------------
# deterministic random-walk corpus (node2vec-style sequence generation)
# ---------------------------------------------------------------------------

_WALK_STEPS = 4
_WALK_SEED_MOD = 25
_WALK_SALT = 71
_WALK_SHIFT = 2_147_483_648  # 2^31: packs (score, node) into one BIGINT


def _walk_score(u: str, t: int, v: str) -> str:
    """Deterministic per-(node, step, neighbor) score — the hash that
    replaces the RNG so walk corpora are reproducible shard-by-shard."""
    return mix_sql(f"({u}) * 131 + {t} * 17 + ({v}) * 7919", _WALK_SALT)


def _walk_oracle() -> str:
    ctes = [
        f"""e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)""",
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        f"""w0 AS (
  SELECT DISTINCT src AS walker, src AS node FROM edges
  WHERE src % {_WALK_SEED_MOD} = 0 AND src < {_SUPP_BASE}
)""",
    ]
    sel = [
        "SELECT walker, CAST(0 AS BIGINT) AS step, CAST(node AS BIGINT) AS node"
        " FROM w0"
    ]
    for t in range(1, _WALK_STEPS + 1):
        ctes.append(
            f"""w{t} AS (
  SELECT w.walker,
         CAST(MIN({_walk_score("w.node", t, "e.dst")} * {_WALK_SHIFT} + e.dst)
              % {_WALK_SHIFT} AS BIGINT) AS node
  FROM w{t - 1} w JOIN edges e ON w.node = e.src
  GROUP BY w.walker
)"""
        )
        sel.append(
            f"SELECT walker, CAST({t} AS BIGINT) AS step, node FROM w{t}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)


@register("graph_random_walks", oracle=_walk_oracle(), tags=("graph", "iterative"))
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-corpus generation (the node2vec/DeepWalk data pass): from
    every seed node, take {_WALK_STEPS} steps, each choosing the
    neighbor that minimizes a deterministic (node, step, neighbor) hash
    — RNG replaced by the portable mix hash, so the 'random' walk corpus
    is bit-reproducible on any engine and any shard layout (the property
    that makes a 100 TB embedding-training corpus auditable).  The
    (score, neighbor) argmin packs into one BIGINT (score * 2^31 +
    node), so each step is a plain MIN aggregate.

    Scale design: each step is one frontier join against the cached
    src-partitioned edge list (SHUFFLE_HASH-hinted like pagerank) + one
    partial-agg MIN — walker-count rows in flight, never |V|; steps
    unroll into one Catalyst plan.  Emits the full (walker, step, node)
    trajectory table — exactly the skip-gram training input.

    Reference analogue: none (graph-embedding surface beside PPR/BFS);
    the deterministic-RNG discipline comes from the reference's seeded
    smearing (§2.8 deterministic random, corrections.py)."""
    ed, _ = _edges_deg(spark, sf_dir)
    seeds = (
        ed.filter(
            (F.col("src") % _WALK_SEED_MOD == 0) & (F.col("src") < _SUPP_BASE)
        )
        .select(F.col("src").alias("walker"))
        .distinct()
        .localCheckpoint()
    )
    walk = seeds.select("walker", F.col("walker").alias("node"))
    out = walk.select("walker", F.lit(0).cast("long").alias("step"), "node")
    for t in range(1, _WALK_STEPS + 1):
        walk = (
            ed.join(walk.hint("shuffle_hash"), ed.src == walk.node)
            .groupBy("walker")
            .agg(
                F.expr(
                    f"CAST(MIN({_walk_score('node', t, 'dst')} * {_WALK_SHIFT} + dst)"
                    f" % {_WALK_SHIFT} AS BIGINT)"
                ).alias("node")
            )
        )
        out = out.unionByName(
            walk.select("walker", F.lit(t).cast("long").alias("step"), "node")
        )
    return out

# ---------------------------------------------------------------------------
# degree assortativity: do high-degree nodes attach to high-degree nodes?
# (Newman 2002) — the one-number mixing diagnostic run before deciding a
# partitioning/salting strategy for a graph workload.
# ---------------------------------------------------------------------------

_ASSORT_ORACLE = f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
j AS (
  SELECT ds.deg AS dx, dd.deg AS dy
  FROM edges e JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy
  FROM j
)
SELECT n, sx, sy, sxx, syy, sxy,
       CAST(ROUND(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         * 1e9) AS BIGINT) / 1e9 AS r
FROM s
"""


@register("graph_degree_assortativity", oracle=_ASSORT_ORACLE, tags=("graph",))
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the symmetrized customer<->supplier graph:
    the Pearson correlation of (deg(src), deg(dst)) over directed edges,
    computed ENTIRELY from BIGINT sufficient statistics (degrees are
    integers, so n/sx/sy/sxx/syy/sxy are exact; only the final Pearson
    ratio touches doubles, from identical integers on both engines via
    the identical expression — bit-exact modulo the shared e9 rounding).
    Plan: the session-cached edge list already carries deg(src) from its
    degree window; deg(dst) arrives by one broadcast of the |nodes|-sized
    degree table; then a single partial-agg reduction to ONE row.  At
    100 TB the same plan holds (sufficient stats are the textbook
    map-side-combine shape); BIGINT headroom: sxy <= |E| * max_deg^2 —
    switch the three product sums to DECIMAL(38,0) past ~1e18."""
    ed, deg = _edges_deg(spark, sf_dir)
    j = ed.select("dst", F.col("deg").alias("dx")).join(
        F.broadcast(deg.select(F.col("src").alias("dst"), F.col("deg").alias("dy"))),
        "dst",
    )
    s = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    return s.selectExpr(
        "n", "sx", "sy", "sxx", "syy", "sxy",
        "CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
        " * 1e9) AS BIGINT) / 1e9 AS r",
    )


# ---------------------------------------------------------------------------
# modularity of the LPA communities: the one-number quality score of a
# partition (Newman-Girvan Q), composed on top of the label-propagation
# loop — "did the community detection actually find structure?"
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    # Q = sum_c (intra_c * 2m - deg_c^2) / (2m)^2, all-integer numerator;
    # the final 1e-9 fixed point uses the sign-split decomposition
    # because DuckDB's // floors while Spark's DIV truncates — they only
    # agree on non-negative operands.
    fp = (
        "((ABS(s) // den) * 1000000 + ((ABS(s) % den) * 1000000) // den)"
    )
    return f"""
WITH lpa AS (SELECT node, community FROM ({_lpa_oracle()}) t),
e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS two_m FROM edges),
el AS (
  SELECT ls.community AS cs, ld.community AS cd
  FROM edges e JOIN lpa ls ON e.src = ls.node JOIN lpa ld ON e.dst = ld.node
),
intra AS (
  SELECT cs AS community, CAST(COUNT(*) AS BIGINT) AS intra
  FROM el WHERE cs = cd GROUP BY 1
),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY 1),
degc AS (
  SELECT l.community, CAST(SUM(d.d) AS BIGINT) AS deg_sum
  FROM deg d JOIN lpa l ON d.node = l.node GROUP BY 1
),
c AS (
  SELECT dc.community, COALESCE(i.intra, 0) AS intra, dc.deg_sum,
         COALESCE(i.intra, 0) * (SELECT two_m FROM m)
           - dc.deg_sum * dc.deg_sum AS contrib
  FROM degc dc LEFT JOIN intra i USING (community)
),
g AS (
  SELECT community, intra, deg_sum, contrib,
         SUM(contrib) OVER () AS s,
         (SELECT two_m FROM m) * (SELECT two_m FROM m) AS den
  FROM c
)
SELECT community, intra, deg_sum, contrib,
       CAST(CASE WHEN s >= 0 THEN {fp} ELSE -{fp} END AS BIGINT) AS q_e6
FROM g
"""


@register("graph_modularity", oracle=_modularity_oracle(), tags=("graph", "evaluation"))
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity of the LPA partition: per community the
    intra-edge count, total degree, and integer contribution
    intra*2m - deg^2; the global Q rides every row as a 1e-6 fixed-point
    of sum(contrib)/(2m)^2 — the whole computation is BIGINT (the
    assortativity recipe), so the score is bit-reproducible on top of an
    ITERATIVE upstream.  The 1e-6 scale keeps (s % den) * 1e6 inside BIGINT up to
    ~2e6 directed edges at this den. Sign-split final division because DuckDB's //
    floors while Spark's DIV truncates (they agree only for
    non-negative operands).  Plan: the converged |nodes|-sized label
    frontier is localCheckpointed and BROADCAST to both edge endpoints
    (never shuffling the edge list), then two partial-agg rollups to
    |communities| rows; the window walks those few rows.  BIGINT
    headroom: contrib <= 2m * max(intra, deg^2/2m) — promote to
    DECIMAL(38,0) past ~1e9 directed edges."""
    ed, deg = _edges_deg(spark, sf_dir)
    lbl = lpa_iterations(
        ed, deg, _LP_ROUNDS, npart=_graph_npart(spark, sf_dir)
    ).localCheckpoint()
    two_m = ed.count()
    ls = lbl.select(F.col("node").alias("src"), F.col("lbl").alias("cs"))
    ld = lbl.select(F.col("node").alias("dst"), F.col("lbl").alias("cd"))
    intra = (
        ed.select("src", "dst")
        .join(F.broadcast(ls), "src")
        .join(F.broadcast(ld), "dst")
        .filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("community"))
        .agg(F.count("*").cast("long").alias("intra"))
    )
    degc = (
        deg.join(F.broadcast(lbl.withColumnRenamed("node", "src")), "src")
        .groupBy(F.col("lbl").alias("community"))
        .agg(F.sum("deg").cast("long").alias("deg_sum"))
    )
    c = degc.join(intra, "community", "left").select(
        "community",
        F.coalesce(F.col("intra"), F.lit(0)).cast("long").alias("intra"),
        "deg_sum",
        (
            F.coalesce(F.col("intra"), F.lit(0)).cast("long")
            * F.lit(two_m).cast("long")
            - F.col("deg_sum") * F.col("deg_sum")
        )
        .cast("long")
        .alias("contrib"),
    )
    wa = Window.orderBy("community").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    fp = (
        "((ABS(s) DIV den) * 1000000 + ((ABS(s) % den) * 1000000) DIV den)"
    )
    return (
        c.withColumn("s", F.sum("contrib").over(wa).cast("long"))
        .withColumn("den", F.lit(two_m).cast("long") * F.lit(two_m).cast("long"))
        .selectExpr(
            "community",
            "intra",
            "deg_sum",
            "contrib",
            f"CAST(CASE WHEN s >= 0 THEN {fp} ELSE -{fp} END AS BIGINT) AS q_e6",
        )
    )


from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
