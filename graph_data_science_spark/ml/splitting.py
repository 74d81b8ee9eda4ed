"""Train/test splitting utilities (reference ``ml/ml-algo/.../splitting/``:
``SplitRelationships.java:61-95``, ``DirectedEdgeSplitter.java:55-88``,
``UndirectedEdgeSplitter.java:60-95``, ``FractionSplitter.java:33-49``,
``StratifiedKFoldSplitter.java:76-110``, and
``negativeSampling/RandomNegativeSampler.java:43-110`` — the
``gds.graph.relationships.split`` procedure + pipeline splitters).

Distributed re-expression. The reference's samplers walk edges
SEQUENTIALLY, keeping a running ``remaining/candidates`` acceptance
probability so the holdout size is exact. The order-free equivalent with
the same contract (exactly ⌊validCount · fraction⌋ selected, uniformly
without replacement, deterministic in the seed) is a seeded-hash ranking:
rank candidates by ``hash(seed, src, dst)`` and take a prefix. One shuffle
(the rank window / top-k), no driver loop, replayable bit-for-bit in SQL
with the portable md5 rng — which is what the driver oracle does.

Negative sampling mirrors ``RandomNegativeSampler``'s per-source budgeting
(equal share of the request per valid source, capped by each node's
non-neighbor capacity; the reference's running share converges to the same
allocation) and its best-effort contract: each source draws exactly its
budget of seeded-hash targets and rejections are NOT retried — the
reference comment says sampling "does not guarantee" the requested count.
Rejection = self-loop, existing master-graph edge, or invalid target
label. The draw grid is ``budget ≤ need`` rows per source (array explode),
the rejection test is one broadcast-or-shuffle anti-join against the
master edge list — linear in candidates, never all-pairs. A shortfall is
logged (no silent caps).

At 100 TB: selection is a hash-rank top-k (AQE-splittable single shuffle);
the negative-sample anti-join keys on (src, dst) like any edge join; the
position maps, fraction ranks, and k-fold sequence indexes are bucketed
order-preserving ranks (``graph/ranks.py`` — range buckets + per-bucket
windows + driver prefix offsets), never a partition-less global window.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.graph.build import LinkGraph
from graph_data_science_spark.graph.ranks import ordered_rank

log = logging.getLogger("spark_link_graph.splitting")


def _hash(seed, *cols):
    """Portable seeded hash (md5 15-hex-digit prefix) — replayable in any
    engine; same construction as algorithms.walks._hash."""
    payload = F.concat_ws(":", F.lit(str(int(seed))), *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


@dataclass
class RelationshipSplit:
    selected: DataFrame  # (src, dst, label double) — holdout positives + negatives
    remaining: DataFrame  # (src, dst, weight) — the rest of the graph
    selected_positive_count: int
    negative_count: int


def split_relationships(
    graph: LinkGraph,
    holdout_fraction: float,
    negative_sampling_ratio: float = 1.0,
    random_seed: int = 42,
    undirected: bool = False,
    source_nodes: DataFrame | None = None,
    target_nodes: DataFrame | None = None,
    master_graph: LinkGraph | None = None,
) -> RelationshipSplit:
    """``gds.graph.relationships.split`` (``SplitRelationships.java:61-95``).

    - holdout positives: ⌊validCount · holdout_fraction⌋ edges whose
      endpoints pass the source/target filters, label 1.0
      (``EdgeSplitter.POSITIVE``).
    - remaining: every other valid edge, weight preserved. Invalid edges
      (filtered endpoints) join NEITHER set, per the reference.
    - negatives: ⌊selected · negative_sampling_ratio⌋ non-adjacent (in
      ``master_graph``, default the input graph) pairs, label 0.0, added
      to the selected set (``SplitRelationships.compute`` adds them via
      the negative sampler with testSetSize only).
    - ``undirected=True``: candidates are canonical ``src < dst`` pairs
      (the reference samples each undirected relationship once,
      ``UndirectedEdgeSplitter.positiveSampling:71``); selected pairs are
      emitted once in a valid orientation, remaining pairs keep both
      directions.
    """
    edges = graph.edges
    wcol = (
        F.col("weight").cast("double")
        if "weight" in edges.columns
        else F.lit(1.0)
    )
    e = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), wcol.alias("weight")
    )
    if undirected:
        canon = F.when(F.col("src") < F.col("dst"), F.struct("src", "dst")).otherwise(
            F.struct(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        e = (
            e.filter(F.col("src") != F.col("dst"))
            .select(canon.alias("c"), "weight")
            .select(F.col("c.src").alias("src"), F.col("c.dst").alias("dst"), "weight")
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )

    def _ids(df: DataFrame) -> DataFrame:
        return df.select(F.col(df.columns[0]).cast("long").alias("node_id")).distinct()

    # Validity filter (isValidNodePair): src ∈ sources AND dst ∈ targets;
    # undirected accepts either orientation.
    if source_nodes is not None or target_nodes is not None:
        src_ok = _ids(source_nodes) if source_nodes is not None else graph.node_ids()
        tgt_ok = _ids(target_nodes) if target_nodes is not None else graph.node_ids()
        fwd = e.join(
            src_ok.select(F.col("node_id").alias("src")), "src", "semi"
        ).join(tgt_ok.select(F.col("node_id").alias("dst")), "dst", "semi")
        if undirected:
            rev = e.join(
                src_ok.select(F.col("node_id").alias("dst")), "dst", "semi"
            ).join(tgt_ok.select(F.col("node_id").alias("src")), "src", "semi")
            fwd_flag = fwd.select("src", "dst").withColumn("_fwd", F.lit(1))
            valid = (
                e.join(fwd_flag, ["src", "dst"], "left")
                .join(rev.select("src", "dst").withColumn("_rev", F.lit(1)), ["src", "dst"], "left")
                .filter(F.col("_fwd").isNotNull() | F.col("_rev").isNotNull())
                # valid orientation for the selected emit: forward if it
                # passes, else reversed (UndirectedEdgeSplitter:78-82)
                .withColumn("_flip", F.col("_fwd").isNull())
                .select("src", "dst", "weight", "_flip")
            )
        else:
            valid = fwd.withColumn("_flip", F.lit(False))
    else:
        valid = e.withColumn("_flip", F.lit(False))

    # GDS GraphStores aggregate parallel relationships; mirror that so the
    # hash rank is over distinct (src, dst) pairs.
    if not undirected:
        valid = valid.groupBy("src", "dst").agg(
            F.max("weight").alias("weight"), F.min("_flip").alias("_flip")
        )
    valid = valid.withColumn(
        "_h", _hash(random_seed, F.col("src"), F.col("dst"))
    ).persist()
    valid_count = valid.count()
    n_selected = int(valid_count * holdout_fraction)

    # Exact-count selection of the n_selected smallest (_h, src, dst)
    # rows. NOT orderBy().limit(): Spark plans that as
    # TakeOrderedAndProject, whose finishing step holds ALL `limit` rows
    # in one task — and n_selected is data-proportional (holdoutFraction
    # × |E|), so at 100 TB that single task is the job. The bucketed
    # order-preserving rank (graph/ranks.py) gives the identical
    # selection with per-task work bounded by the rank bucket size.
    positives = (
        ordered_rank(valid, ["_h", "src", "dst"], rank_col="_hr", n_buckets=None, n_rows=valid_count)
        .filter(F.col("_hr") < n_selected)
        .drop("_hr")
        .persist()
    )
    selected_pos = positives.select(
        F.when(F.col("_flip"), F.col("dst")).otherwise(F.col("src")).alias("src"),
        F.when(F.col("_flip"), F.col("src")).otherwise(F.col("dst")).alias("dst"),
        F.lit(1.0).alias("label"),
    )
    rem = valid.join(positives.select("src", "dst"), ["src", "dst"], "anti")
    if undirected:
        remaining = rem.select("src", "dst", "weight").union(
            rem.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    else:
        remaining = rem.select("src", "dst", "weight")

    n_neg = int(n_selected * negative_sampling_ratio)
    negatives = negative_sample(
        master_graph if master_graph is not None else graph,
        n_neg,
        random_seed=random_seed,
        source_nodes=source_nodes,
        target_nodes=target_nodes,
    )
    neg_count = negatives.count()
    selected = selected_pos.union(negatives.select("src", "dst", F.lit(0.0).alias("label")))
    valid.unpersist()
    positives.unpersist()
    return RelationshipSplit(
        selected=selected,
        remaining=remaining,
        selected_positive_count=n_selected,
        negative_count=neg_count,
    )


def negative_sample(
    graph: LinkGraph,
    count: int,
    random_seed: int = 42,
    source_nodes: DataFrame | None = None,
    target_nodes: DataFrame | None = None,
) -> DataFrame:
    """Non-adjacent (src, dst) pairs, label-free
    (``RandomNegativeSampler.produceNegativeSamples:60-110``). Budget =
    equal share of ``count`` per valid source (first ``count % S`` sources
    by id get one extra), capped by each source's non-neighbor capacity;
    each source draws exactly its budget of seeded targets, rejecting
    self-loops / master-graph edges / invalid targets WITHOUT retry —
    best-effort, as the reference documents. Shortfall is logged."""
    nodes = graph.node_ids().select(F.col("node_id").cast("long")).distinct().persist()
    n = nodes.count()
    if count <= 0 or n < 2:
        nodes.unpersist()
        return nodes.sparkSession.createDataFrame([], "src long, dst long")

    # dense position → node id map for uniform target draws. Order-
    # preserving bucketed rank (graph/ranks.py) — NOT a partition-less
    # row_number window, which would drag the full node set through one
    # task at scale.
    pos_map = ordered_rank(nodes, ["node_id"], rank_col="_pos", n_buckets=None, n_rows=n).select(
        "_pos", F.col("node_id").alias("dst")
    )

    dedup_edges = (
        graph.edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).distinct()
    )
    srcs = nodes
    if source_nodes is not None:
        flt = source_nodes.select(
            F.col(source_nodes.columns[0]).cast("long").alias("node_id")
        ).distinct()
        srcs = srcs.join(flt, "node_id", "semi")
    deg = dedup_edges.groupBy(F.col("src").alias("node_id")).agg(F.count("*").alias("deg"))
    srcs = ordered_rank(
        srcs.join(deg, "node_id", "left").select(
            "node_id", F.coalesce(F.col("deg"), F.lit(0)).alias("deg")
        ),
        ["node_id"],
        rank_col="_sr",
        n_buckets=None,
        n_rows=n,
    ).persist()
    s_count = srcs.count()
    base, extra = divmod(count, max(s_count, 1))
    # first `extra` sources by id (0-based rank) get one extra draw
    budget = F.least(
        F.lit(base) + (F.col("_sr") < extra).cast("long"),
        (F.lit(n - 1) - F.col("deg")).cast("long"),
    )
    draws = (
        srcs.withColumn("_budget", budget)
        .filter(F.col("_budget") > 0)
        .select(
            F.col("node_id").alias("src"),
            F.explode(F.sequence(F.lit(0), F.col("_budget") - 1)).alias("_i"),
        )
        .withColumn("_pos", F.pmod(_hash(random_seed, F.col("src"), F.col("_i")), F.lit(n)))
        .join(pos_map, "_pos")
        .filter(F.col("src") != F.col("dst"))
    )
    if target_nodes is not None:
        tf = target_nodes.select(
            F.col(target_nodes.columns[0]).cast("long").alias("dst")
        ).distinct()
        draws = draws.join(tf, "dst", "semi")
    out = draws.join(dedup_edges, ["src", "dst"], "anti").select("src", "dst")
    got = out.count()
    if got < count:
        log.info(
            "negative_sample: produced %d of %d requested (rejections are not "
            "retried, per the reference's best-effort contract)", got, count
        )
    nodes.unpersist()
    srcs.unpersist()
    return out


def fraction_split(
    df: DataFrame, train_fraction: float, order_col: str
) -> tuple[DataFrame, DataFrame]:
    """``FractionSplitter.split:42-49``: train = the first
    ⌊n · trainFraction⌋ rows in ``order_col`` order, test = the rest. The
    reference takes ids in caller order (the caller pre-shuffles); the
    explicit order column is that contract made visible. Rank is the
    bucketed order-preserving one (graph/ranks.py), so no single task
    ever sees the whole training set."""
    n = df.count()
    train_size = int(n * train_fraction)
    order = [order_col] + [c for c in df.columns if c != order_col]
    ranked = ordered_rank(df, order, rank_col="_r", n_buckets=None, n_rows=n)
    train = ranked.filter(F.col("_r") < train_size).drop("_r")
    test = ranked.filter(F.col("_r") >= train_size).drop("_r")
    return train, test


def stratified_kfold_split(
    df: DataFrame,
    k: int,
    target_col: str,
    order_col: str,
) -> DataFrame:
    """``StratifiedKFoldSplitter.splits:76-110``: iterate classes in sorted
    order, items within a class in caller order, assigning each item to a
    TEST fold via one global round-robin pointer that carries across
    classes — i.e. fold = (global sequence index over (class, position))
    mod k. Every item is train for the other k−1 folds. Returns the input
    plus a ``fold`` column (the item's test fold).

    Distributed: the global sequence index decomposes as
    ``class_offset(class) + within_class_rank`` — per-class counts are a
    tiny collect (one row per class), prefix-summed on the driver in
    sorted class order, and the within-class rank is the bucketed
    order-preserving rank partitioned by class (graph/ranks.py). No
    partition-less window anywhere; per-task work is bounded by the rank
    bucket size, not the class size."""
    if k < 2:
        raise ValueError("k must be >= 2")
    ties = [c for c in df.columns if c not in (target_col, order_col)]
    cls_rows = df.groupBy(target_col).agg(F.count("*").alias("_n")).collect()

    # sorted class order (Python's sort matches Spark's for numerics and
    # for strings — UTF-8 bytewise == code-point order). NULL/NaN labels
    # sort first/last deterministically instead of raising (the reference
    # can't see them — its class set is a long-id map — so any stable
    # order preserves its semantics for the labels it accepts).
    def _cls_key(r):
        v = r[target_col]
        if v is None:
            return (0, 0, "")
        if isinstance(v, float) and v != v:
            return (2, 0, "")
        return (1, v, "") if not isinstance(v, str) else (1, 0, v)

    offsets, acc = [], 0
    for r in sorted(cls_rows, key=_cls_key):
        offsets.append((r[target_col], acc))
        acc += r["_n"]
    ranked = ordered_rank(
        df,
        [order_col] + ties,
        rank_col="_wr",
        partition_cols=(target_col,),
        n_buckets=None,
        n_rows=acc,
    )
    if offsets:
        # typed null-safe broadcast join — string-keyed maps mis-spell
        # floats (Python '1e+20' vs Spark '1.0E20') and drop NULL labels
        spark = df.sparkSession
        from pyspark.sql.types import LongType, StructField, StructType

        odf = spark.createDataFrame(
            offsets,
            StructType(
                [
                    StructField("_kf_cls", df.schema[target_col].dataType, True),
                    StructField("_kf_off", LongType(), False),
                ]
            ),
        )
        ranked = ranked.join(
            F.broadcast(odf), ranked[target_col].eqNullSafe(odf["_kf_cls"]), "left"
        ).drop("_kf_cls")
        off_col = F.col("_kf_off")
    else:
        off_col = F.lit(0)
    out = ranked.withColumn("fold", ((F.col("_wr") + off_col) % k).cast("int")).drop("_wr")
    return out.drop("_kf_off") if offsets else out
