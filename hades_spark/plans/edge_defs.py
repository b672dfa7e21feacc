"""Schema-driven edge materialization — the reference's KG-construction core.

The reference drives ``hades db graph materialize`` from 16 declarative
``EdgeCollectionDef``s (``nl_graph_schema.py:474-491``): each names a source
field on node documents, the node types it may come from, whether the field
is scalar/array/chain, and which attributes to copy onto the edge; the
materializer is data-driven with no edge-specific code
(``nl_graph_materialize.py:124-350``). Restated Spark-first over ONE nodes
table (node_type column instead of 84 physical collections) and ONE edges
table partitioned by ``rel``:

- standard defs: ``explode`` the ref field -> resolve full ids -> validate
  the target node exists (left-semi join) -> composite dedup key
  (``{from}__{to}``, ``nl_graph_materialize.py:178``);
- chain defs: sequential chain[i] -> chain[i+1] edges with
  ``chain_position`` plus membership edges lineage-doc -> member
  (``:264-350``), expressed with posexplode + lead() (SURVEY W2);
- per-def MaterializeStats (edges built / skipped) mirroring ``:47-66``;
- idempotent load: dedup on edge key before an append/MERGE
  (``onDuplicate=replace`` semantics, I2).

Named graphs (``NamedGraphDef``, ``nl_graph_schema.py:174-213``) become
relation-filtered views over the edges table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class EdgeDef:
    """Declarative edge family (mirror of the reference EdgeCollectionDef)."""

    name: str                       # relation name (edges.rel)
    source_field: str               # props key holding the reference(s)
    from_types: tuple[str, ...]     # node_type whitelist for source nodes
    kind: str = "standard"          # 'standard' (scalar/array) | 'chain'
    edge_attributes: tuple[str, ...] = field(default=())


@dataclass
class MaterializeStats:
    edges_created: int = 0
    edges_skipped: int = 0


def _refs_of(nodes: DataFrame, edge_def: EdgeDef) -> DataFrame:
    """Scan nodes of the def's types having the source field; explode the
    (comma-separated) reference list to one row per ref, keeping order."""
    src = nodes.filter(
        F.col("node_type").isin(*edge_def.from_types)
        & F.col("props").getItem(edge_def.source_field).isNotNull()
    )
    attr_cols = [
        F.col("props").getItem(a).alias(f"attr_{a}")
        for a in edge_def.edge_attributes
    ]
    return src.select(
        F.col("node_id").alias("src"),
        F.posexplode(
            F.split(F.col("props").getItem(edge_def.source_field), ",", -1)
        ).alias("pos", "ref"),
        *attr_cols,
    ).withColumn("ref", F.trim("ref")).filter(F.col("ref") != "")


def build_standard_edges(nodes: DataFrame, edge_def: EdgeDef,
                         valid_ids: DataFrame | None = None) -> DataFrame:
    """Standard def -> edge rows. Target validation = broadcast semi-join
    against node ids (the reference skips refs whose target collection /
    document is absent)."""
    refs = _refs_of(nodes, edge_def)
    if valid_ids is None:
        valid_ids = F.broadcast(
            nodes.select(F.col("node_id").alias("ref")).distinct())
    resolved = refs.join(valid_ids, "ref", "left_semi")
    attr_cols = [F.col(f"attr_{a}").alias(a) for a in edge_def.edge_attributes]
    from ..functions.keys import composite_dedup_key_col

    return resolved.select(
        "src",
        F.col("ref").alias("dst"),
        F.lit(edge_def.name).alias("rel"),
        F.lit(edge_def.source_field).alias("source_field"),
        composite_dedup_key_col(F.col("src"), F.col("ref")).alias("edge_key"),
        F.lit(None).cast("int").alias("chain_position"),
        *attr_cols,
    ).dropDuplicates(["edge_key", "rel"])


def build_chain_edges(nodes: DataFrame, edge_def: EdgeDef,
                      valid_ids: DataFrame | None = None) -> DataFrame:
    """Chain def -> sequential chain[i]->chain[i+1] edges (lead() over the
    chain position, W2) plus lineage-doc -> member edges.

    Reference parity (``nl_graph_materialize.py:264-350``): the reference
    skips a chain only when the RAW chain has fewer than 2 members
    (``len(chain) < 2`` BEFORE any ref resolution); past that gate, a chain
    member whose target node is missing breaks the chain at that point —
    the edges ADJACENT to the missing member are skipped, never bridged
    (chain 'A,MISSING,C' yields NO sequential edge, not A->C) — while
    membership edges are emitted for each RESOLVABLE member independently
    (chain 'A,MISSING' yields the A membership edge)."""
    from pyspark.sql import Window

    refs = _refs_of(nodes, edge_def)
    if valid_ids is None:
        valid_ids = F.broadcast(
            nodes.select(F.col("node_id").alias("ref")).distinct())
    flag_ids = valid_ids.withColumn("_ok", F.lit(1))
    flagged = refs.join(flag_ids, "ref", "left") \
                  .withColumn("_valid", F.col("_ok").isNotNull()).drop("_ok")

    w = Window.partitionBy("src").orderBy("pos")
    wall = Window.partitionBy("src")
    # raw chain length: count of ALL members, valid or not (reference gate)
    n_raw = F.count("*").over(wall)

    seq = (
        flagged
        .withColumn("_n_raw", n_raw)
        .withColumn("next_ref", F.lead("ref").over(w))
        .withColumn("next_valid", F.lead("_valid").over(w))
        .filter(F.col("_valid") & F.coalesce("next_valid", F.lit(False))
                & (F.col("_n_raw") >= 2))
        .select(
            F.col("ref").alias("src"),
            F.col("next_ref").alias("dst"),
            F.lit(edge_def.name).alias("rel"),
            F.lit(edge_def.source_field).alias("source_field"),
            F.concat_ws("__", F.translate(F.col("src"), "/", "_"),
                        F.concat(F.lit("step_"), F.col("pos"))).alias("edge_key"),
            F.col("pos").cast("int").alias("chain_position"),
        )
    )
    member = (
        flagged
        .withColumn("_n_raw", n_raw)
        .filter(F.col("_valid") & (F.col("_n_raw") >= 2))
        .select(
            "src",
            F.col("ref").alias("dst"),
            F.lit(edge_def.name).alias("rel"),
            F.lit(edge_def.source_field).alias("source_field"),
            F.concat_ws("__", F.translate("src", "/", "_"),
                        F.concat(F.lit("member_"), F.col("pos"))).alias("edge_key"),
            F.col("pos").cast("int").alias("chain_position"),
        )
    )
    return seq.unionByName(member)


def materialize_edges(
    nodes: DataFrame,
    edge_defs: list[EdgeDef],
) -> tuple[DataFrame, dict[str, MaterializeStats]]:
    """Run every def; returns (edges union, per-def stats). The union is
    partition-ready on ``rel`` (write with .partitionBy('rel')).

    One shared broadcast valid-id set for every def (not rebuilt per def)
    and ONE stats action over the union (groupBy(rel).count()) —
    previously N defs cost N count() jobs each re-scanning nodes. The
    union is materialized with ``localCheckpoint`` (not ``.cache()``): the
    blocks are reference-tracked and freed when the returned frame is
    GC'd, so repeated materialize calls in a long-lived session don't
    accumulate catalog-pinned storage."""
    if not edge_defs:
        raise ValueError("no edge defs")
    valid_ids = F.broadcast(
        nodes.select(F.col("node_id").alias("ref")).distinct())
    out: DataFrame | None = None
    for d in edge_defs:
        built = (build_chain_edges if d.kind == "chain"
                 else build_standard_edges)(nodes, d, valid_ids=valid_ids)
        base_cols = ["src", "dst", "rel", "source_field", "edge_key",
                     "chain_position"]
        built = built.select(*base_cols)  # attrs vary per def; union core
        out = built if out is None else out.unionByName(built)
    out = out.localCheckpoint(eager=True)
    counts = {r["rel"]: r["n"] for r in
              out.groupBy("rel").agg(F.count("*").alias("n")).collect()}
    stats = {d.name: MaterializeStats(edges_created=counts.get(d.name, 0))
             for d in edge_defs}
    return out, stats


def named_graph_view(edges: DataFrame, rels: list[str]) -> DataFrame:
    """NamedGraphDef equivalent: relation-filtered view (partition-pruned
    when edges are written partitioned by rel)."""
    return edges.filter(F.col("rel").isin(*rels))
