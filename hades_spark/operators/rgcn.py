"""RGCN structural node embeddings — numpy training + distributed inference.

Rebuilds the reference's learned structural-embedding component (X10;
reference: ``core/graph/model.py:34-149`` — two-layer RGCN with basis
decomposition, link-prediction dot-product decoder;
``core/graph/train.py:51-565`` — BCE training with 1:1 negative sampling,
L2-normalized outputs exported back to the node store) as a Spark-first
pipeline with no torch/torch-geometric dependency:

- **Training** runs on the driver over a DETERMINISTIC BOUNDED SAMPLE of
  the edge set (``sample_training_edges``). That is the honest 100-TB
  shape: full-graph backprop over a 10^12-edge graph is not a thing —
  production GNN systems train on sampled subgraphs and run inference
  over the full graph. The model is pure numpy (Schlichtkrull et al.
  2018, "Modeling Relational Data with Graph Convolutional Networks" —
  public math), manual backprop, Adam, seeded: fully deterministic.
- **Inference** is distributed and trains nothing. Per layer: one
  shuffle to mean-aggregate incoming neighbor vectors per
  ``(dst, relation)`` (``Summarizer.mean`` — JVM-side over ml vectors),
  a vectorized pandas-UDF relation transform with the broadcast weight
  stack (a few hundred KiB), and one shuffle to sum relation messages
  per node. Vectors are fixed-width; node data is never collected.

Parity between the two paths is pinned by tests: the distributed
forward equals the numpy forward on the same graph to 1e-6, and the
analytic gradients pass a numerical-gradient check.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

__all__ = [
    "NumpyRGCN",
    "build_local_graph",
    "edges_with_inverse",
    "rgcn_inference",
    "rgcn_node_embeddings",
    "sample_training_edges",
]

_EPS = 1e-12
_INV_SUFFIX = "__inv"


# ---------------------------------------------------------------------------
# Graph indexing (shared by local training and the distributed path)
# ---------------------------------------------------------------------------

def edges_with_inverse(edges: DataFrame, src: str = "src", dst: str = "dst",
                       rel: str = "rel") -> DataFrame:
    """Symmetrize a directed multi-relational edge frame.

    Standard RGCN practice (Schlichtkrull §2.1): every relation ``r``
    gets an inverse relation so messages flow both ways. Pure column
    ops — one union, no shuffle.
    """
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                       F.col(rel).alias("rel"))
    inv = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"),
                       F.concat(F.col(rel), F.lit(_INV_SUFFIX)).alias("rel"))
    return fwd.unionByName(inv)


@dataclass
class LocalGraph:
    """Driver-side indexed view of a (sampled) multi-relational graph."""

    nodes: list                      # node id -> name
    node_index: dict                 # name -> id
    relations: list                  # rel id -> name
    rel_index: dict                  # name -> id
    types: list                      # type id -> name
    type_index: dict                 # name -> id
    node_type: np.ndarray            # [N] type id per node
    # per relation: (dst_idx[E_r], src_idx[E_r], weight[E_r]) where
    # weight = 1 / in-degree(dst within r) — the mean aggregator
    rel_edges: list = field(default_factory=list)

    @property
    def n_nodes(self) -> int:
        return len(self.nodes)


def build_local_graph(edge_rows, type_rows=None) -> LocalGraph:
    """Index (src, dst, rel) triples + optional (node, type) pairs.

    Node/relation/type vocabularies are sorted for determinism. Nodes
    missing a type row get the reserved type ``"_untyped"``.
    """
    edge_rows = [(str(s), str(d), str(r)) for s, d, r in edge_rows]
    names = sorted({s for s, _, _ in edge_rows} |
                   {d for _, d, _ in edge_rows})
    node_index = {n: i for i, n in enumerate(names)}
    rels = sorted({r for _, _, r in edge_rows})
    rel_index = {r: i for i, r in enumerate(rels)}

    tmap = {str(n): str(t) for n, t in (type_rows or [])}
    types = sorted(set(tmap.values()) | {"_untyped"})
    type_index = {t: i for i, t in enumerate(types)}
    node_type = np.array(
        [type_index.get(tmap.get(n, "_untyped"), 0) for n in names],
        dtype=np.int64)

    g = LocalGraph(nodes=names, node_index=node_index, relations=rels,
                   rel_index=rel_index, types=types, type_index=type_index,
                   node_type=node_type)
    n = len(names)
    for r in rels:
        pairs = sorted({(node_index[d], node_index[s])
                        for s, d, rr in edge_rows if rr == r})
        d_idx = np.array([p[0] for p in pairs], dtype=np.int64)
        s_idx = np.array([p[1] for p in pairs], dtype=np.int64)
        indeg = np.zeros(n, dtype=np.float64)
        np.add.at(indeg, d_idx, 1.0)
        w = 1.0 / indeg[d_idx]
        g.rel_edges.append((d_idx, s_idx, w))
    return g


def _agg(d_idx, s_idx, w, h):
    """Mean-aggregate: out[d] = mean over in-neighbors s of h[s]."""
    out = np.zeros_like(h)
    np.add.at(out, d_idx, h[s_idx] * w[:, None])
    return out


def _agg_T(d_idx, s_idx, w, g):
    """Transpose of :func:`_agg` (for backprop): out[s] += g[d] * w."""
    out = np.zeros_like(g)
    np.add.at(out, s_idx, g[d_idx] * w[:, None])
    return out


# ---------------------------------------------------------------------------
# The model
# ---------------------------------------------------------------------------

class NumpyRGCN:
    """Two-layer RGCN with basis decomposition, numpy end to end.

    Mirrors the reference architecture (``core/graph/model.py:34-149``):
    type-embedding input features, two relational conv layers
    (basis-decomposed ``W_r = sum_b alpha[r,b] B_b`` plus a self-loop
    weight per layer), ReLU between layers, L2-normalized output, and a
    dot-product + sigmoid link decoder trained with BCE against uniform
    negative samples (``core/graph/train.py:224-231``).
    """

    def __init__(self, num_types: int, num_relations: int,
                 hidden_dim: int = 16, embed_dim: int = 8,
                 num_bases: int | None = None, seed: int = 0):
        self.num_types = num_types
        self.num_relations = num_relations
        self.hidden_dim = hidden_dim
        self.embed_dim = embed_dim
        self.num_bases = min(num_bases or max(2, num_relations // 2 + 1),
                             num_relations) if num_relations else 1
        rng = np.random.default_rng(seed)

        def glorot(*shape):
            fan = shape[-2] + shape[-1]
            return rng.normal(0.0, math.sqrt(2.0 / fan), size=shape)

        h, e, b, r = hidden_dim, embed_dim, self.num_bases, num_relations
        self.params = {
            "W_in": glorot(num_types, h),
            "Wself1": glorot(h, h),
            "B1": glorot(b, h, h),
            "A1": rng.normal(0.0, 1.0 / math.sqrt(b), size=(r, b)),
            "Wself2": glorot(h, e),
            "B2": glorot(b, h, e),
            "A2": rng.normal(0.0, 1.0 / math.sqrt(b), size=(r, b)),
        }
        # graph vocabularies captured at fit() time, used by inference
        self.type_index: dict = {}
        self.rel_index: dict = {}

    # -- weight materialization ------------------------------------------
    def rel_weights(self, layer: int) -> np.ndarray:
        """[R, d_in, d_out] relation weights for layer 1 or 2."""
        a = self.params[f"A{layer}"]
        basis = self.params[f"B{layer}"]
        return np.einsum("rb,bio->rio", a, basis)

    # -- forward -----------------------------------------------------------
    def forward(self, g: LocalGraph, cache: dict | None = None) -> np.ndarray:
        """L2-normalized [N, embed_dim] embeddings for every node in g."""
        p = self.params
        h0 = p["W_in"][g.node_type]
        W1 = self.rel_weights(1)
        M1 = [_agg(*re, h0) for re in g.rel_edges]
        S1 = h0 @ p["Wself1"]
        for r, m in enumerate(M1):
            S1 += m @ W1[r]
        h1 = np.maximum(S1, 0.0)
        W2 = self.rel_weights(2)
        M2 = [_agg(*re, h1) for re in g.rel_edges]
        S2 = h1 @ p["Wself2"]
        for r, m in enumerate(M2):
            S2 += m @ W2[r]
        nrm = np.maximum(np.linalg.norm(S2, axis=1, keepdims=True), _EPS)
        z = S2 / nrm
        if cache is not None:
            cache.update(h0=h0, M1=M1, S1=S1, h1=h1, M2=M2, S2=S2,
                         nrm=nrm, z=z, W1=W1, W2=W2)
        return z

    # -- loss + analytic gradients ------------------------------------------
    def loss_and_grads(self, g: LocalGraph, pos, neg):
        """BCE link-prediction loss over pos/neg (s, d) index pairs."""
        cache: dict = {}
        z = self.forward(g, cache)
        s_idx = np.concatenate([pos[0], neg[0]])
        d_idx = np.concatenate([pos[1], neg[1]])
        y = np.concatenate([np.ones(len(pos[0])), np.zeros(len(neg[0]))])
        logits = np.sum(z[s_idx] * z[d_idx], axis=1)
        prob = 1.0 / (1.0 + np.exp(-logits))
        eps = 1e-9
        loss = -np.mean(y * np.log(prob + eps) +
                        (1 - y) * np.log(1 - prob + eps))

        n_pairs = len(y)
        dlogit = (prob - y) / n_pairs
        dz = np.zeros_like(z)
        np.add.at(dz, s_idx, dlogit[:, None] * z[d_idx])
        np.add.at(dz, d_idx, dlogit[:, None] * z[s_idx])

        # through z = S2 / ||S2||
        S2, nrm = cache["S2"], cache["nrm"]
        zc = cache["z"]
        dS2 = (dz - zc * np.sum(zc * dz, axis=1, keepdims=True)) / nrm

        p, grads = self.params, {}
        h1, M2, W2 = cache["h1"], cache["M2"], cache["W2"]
        grads["Wself2"] = h1.T @ dS2
        dW2 = np.stack([m.T @ dS2 for m in M2])            # [R, h, e]
        grads["A2"] = np.einsum("rio,bio->rb", dW2, p["B2"])
        grads["B2"] = np.einsum("rb,rio->bio", p["A2"], dW2)
        dh1 = dS2 @ p["Wself2"].T
        for r, re in enumerate(g.rel_edges):
            dh1 += _agg_T(*re, dS2 @ W2[r].T)
        dS1 = dh1 * (cache["S1"] > 0)

        h0, M1, W1 = cache["h0"], cache["M1"], cache["W1"]
        grads["Wself1"] = h0.T @ dS1
        dW1 = np.stack([m.T @ dS1 for m in M1])            # [R, h, h]
        grads["A1"] = np.einsum("rio,bio->rb", dW1, p["B1"])
        grads["B1"] = np.einsum("rb,rio->bio", p["A1"], dW1)
        dh0 = dS1 @ p["Wself1"].T
        for r, re in enumerate(g.rel_edges):
            dh0 += _agg_T(*re, dS1 @ W1[r].T)
        g_in = np.zeros_like(p["W_in"])
        np.add.at(g_in, g.node_type, dh0)
        grads["W_in"] = g_in
        return loss, grads

    # -- training ------------------------------------------------------------
    def fit(self, g: LocalGraph, epochs: int = 60, lr: float = 0.01,
            seed: int = 0, neg_ratio: float = 1.0) -> list:
        """Adam + BCE over the sampled graph; returns per-epoch losses."""
        self.type_index = dict(g.type_index)
        self.rel_index = dict(g.rel_index)
        zero = np.zeros(0, dtype=np.int64)
        pos_s = np.concatenate([re[1] for re in g.rel_edges]) \
            if g.rel_edges else zero
        pos_d = np.concatenate([re[0] for re in g.rel_edges]) \
            if g.rel_edges else zero
        rng = np.random.default_rng(seed)
        m = {k: np.zeros_like(v) for k, v in self.params.items()}
        v = {k: np.zeros_like(val) for k, val in self.params.items()}
        b1, b2, adam_eps = 0.9, 0.999, 1e-8
        losses, n = [], g.n_nodes
        n_neg = max(1, int(len(pos_s) * neg_ratio))
        for t in range(1, epochs + 1):
            neg = (rng.integers(0, n, n_neg), rng.integers(0, n, n_neg))
            loss, grads = self.loss_and_grads(g, (pos_s, pos_d), neg)
            losses.append(loss)
            for k, gr in grads.items():
                m[k] = b1 * m[k] + (1 - b1) * gr
                v[k] = b2 * v[k] + (1 - b2) * gr * gr
                mh = m[k] / (1 - b1 ** t)
                vh = v[k] / (1 - b2 ** t)
                self.params[k] -= lr * mh / (np.sqrt(vh) + adam_eps)
        return losses

    def link_scores(self, z: np.ndarray, pairs) -> np.ndarray:
        s, d = pairs
        return 1.0 / (1.0 + np.exp(-np.sum(z[s] * z[d], axis=1)))


# ---------------------------------------------------------------------------
# Distributed path
# ---------------------------------------------------------------------------

def sample_training_edges(edges: DataFrame, max_edges: int,
                          src: str = "src", dst: str = "dst",
                          rel: str = "rel") -> list:
    """Deterministic bounded edge sample for driver-side training.

    Orders by ``xxhash64(src, dst, rel)`` — a seedless uniform shuffle
    that is stable across runs and cluster sizes — and takes the first
    ``max_edges``. The collect is bounded by construction.
    """
    rows = (edges.select(src, dst, rel)
            .distinct()
            .orderBy(F.xxhash64(src, dst, rel))
            .limit(int(max_edges))
            .collect())
    return [(r[0], r[1], r[2]) for r in rows]


def _relation_transform_udf(rel_to_idx: dict, weights: np.ndarray):
    """pandas UDF: (rel, vec) -> vec @ weights[rel]; Arrow-batched.

    ``weights`` [R, d_in, d_out] rides the closure (a few hundred KiB —
    torch checkpoints in the reference are shipped the same way,
    ``core/graph/train.py:379-421``). Unknown relations (possible when
    inference sees a relation the training sample did not) contribute a
    zero message rather than failing the job.
    """
    d_out = weights.shape[2]

    @F.pandas_udf(ArrayType(DoubleType()))
    def transform(rel: pd.Series, vec: pd.Series) -> pd.Series:
        mat = np.stack(vec.to_numpy())           # [B, d_in]
        out = np.zeros((len(rel), d_out))
        ridx = rel.map(rel_to_idx)
        for r in ridx.dropna().unique():
            mask = (ridx == r).to_numpy()
            out[mask] = mat[mask] @ weights[int(r)]
        return pd.Series(list(out))

    return transform


def _combine_udf(w_self: np.ndarray, relu: bool, normalize: bool):
    """pandas UDF: (h, msg) -> act(h @ w_self + msg) per node."""
    d_out = w_self.shape[1]

    @F.pandas_udf(ArrayType(DoubleType()))
    def combine(h: pd.Series, msg: pd.Series) -> pd.Series:
        hm = np.stack(h.to_numpy())
        out = hm @ w_self
        have = msg.notna().to_numpy()
        if have.any():
            out[have] += np.stack(msg[have].to_numpy())
        if relu:
            out = np.maximum(out, 0.0)
        if normalize:
            nrm = np.maximum(np.linalg.norm(out, axis=1, keepdims=True),
                             _EPS)
            out = out / nrm
        return pd.Series(list(out))

    return combine


def rgcn_inference(edges: DataFrame, node_types: DataFrame,
                   model: NumpyRGCN, src: str = "src", dst: str = "dst",
                   rel: str = "rel", node: str = "node",
                   type_col: str = "type") -> DataFrame:
    """Distributed 2-layer RGCN forward with frozen weights.

    -> (node, embedding array<double>), matching ``model.forward`` on the
    same graph to float tolerance (tests pin 1e-6).

    Scale shape per layer: join h onto edges (shuffle or AQE-chosen
    broadcast), ``groupBy(dst, rel)`` mean via ``Summarizer`` (JVM),
    vectorized relation transform (weights broadcast in the UDF closure),
    ``groupBy(dst)`` vector sum (JVM), left-join back onto nodes. Two
    shuffles per layer on fixed-width vectors; no driver materialization.
    """
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(rel).alias("rel"))

    # h0: broadcast type -> input row (W_in is [T, h], tiny)
    spark = edges.sparkSession
    w_in = model.params["W_in"]
    t_rows = [(t, [float(x) for x in w_in[i]])
              for t, i in sorted(model.type_index.items())]
    untyped = model.type_index.get("_untyped", 0)
    default_vec = F.array(*[F.lit(float(x)) for x in w_in[untyped]])
    t_df = spark.createDataFrame(t_rows, f"{type_col} string, h0 array<double>")
    h = (node_types.select(F.col(node).alias("node"),
                           F.col(type_col).alias(type_col))
         .join(F.broadcast(t_df), type_col, "left")
         .select("node", F.coalesce("h0", default_vec).alias("h")))

    for layer, relu, normalize in ((1, True, False), (2, False, True)):
        weights = model.rel_weights(layer)
        transform = _relation_transform_udf(model.rel_index, weights)
        msgs = (e.join(h.withColumnRenamed("node", "src"), "src")
                .select("dst", "rel", array_to_vector("h").alias("hv")))
        rel_mean = (msgs.groupBy("dst", "rel")
                    .agg(Summarizer.mean(F.col("hv")).alias("mv"))
                    .select("dst", "rel",
                            vector_to_array("mv").alias("mvec")))
        node_msg = (rel_mean
                    .select("dst", array_to_vector(
                        transform("rel", "mvec")).alias("tv"))
                    .groupBy("dst")
                    .agg(Summarizer.sum(F.col("tv")).alias("sv"))
                    .select(F.col("dst").alias("node"),
                            vector_to_array("sv").alias("msg")))
        combine = _combine_udf(model.params[f"Wself{layer}"], relu,
                               normalize)
        h = (h.join(node_msg, "node", "left")
             .select("node", combine("h", "msg").alias("h")))

    return h.select("node", F.col("h").alias("embedding"))


def rgcn_node_embeddings(edges: DataFrame, node_types: DataFrame,
                         hidden_dim: int = 16, embed_dim: int = 8,
                         epochs: int = 60, lr: float = 0.01, seed: int = 0,
                         max_train_edges: int = 50_000,
                         max_train_types: int = 100_000,
                         add_inverse: bool = True,
                         src: str = "src", dst: str = "dst",
                         rel: str = "rel", node: str = "node",
                         type_col: str = "type"
                         ) -> tuple[DataFrame, NumpyRGCN]:
    """End-to-end X10: sample -> train (driver) -> infer (distributed).

    Returns ``(embeddings_df, model)`` where embeddings_df is
    ``(node, embedding array<double>)`` over the FULL graph. Training
    touches at most ``max_train_edges`` edges (deterministic sample);
    the collect of node types for the sampled nodes is bounded by
    2 x max_train_edges.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(rel).alias("rel"))
    if add_inverse:
        e = edges_with_inverse(e)
    e = e.localCheckpoint(eager=False)

    sample = sample_training_edges(e, max_train_edges)
    sample_nodes = {s for s, _, _ in sample} | {d for _, d, _ in sample}
    nt = node_types.select(F.col(node).alias("node"),
                           F.col(type_col).alias("type"))
    if sample_nodes:
        spark = edges.sparkSession
        sn = spark.createDataFrame([(n,) for n in sorted(sample_nodes)],
                                   "node string")
        type_rows = [(r[0], r[1]) for r in
                     nt.join(F.broadcast(sn), "node", "left_semi")
                       .limit(max_train_types).collect()]
    else:
        type_rows = []

    g = build_local_graph(sample, type_rows)
    model = NumpyRGCN(num_types=len(g.types),
                      num_relations=len(g.relations),
                      hidden_dim=hidden_dim, embed_dim=embed_dim,
                      seed=seed)
    model.fit(g, epochs=epochs, lr=lr, seed=seed)
    out = rgcn_inference(e, nt, model)
    return out, model
