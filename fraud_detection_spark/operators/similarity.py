"""Similarity search over the ``embeddings`` table (array<float>[64]):
brute-force cosine top-k as the exact baseline, LSH/IVF-bucketed ANN as
the scale path, plus general array-column operators.

Scale posture: the query vector is a broadcast literal — the corpus
scan is embarrassingly parallel with no shuffle (top-k via
TakeOrderedAndProject). The ANN variant prunes the scan to the query's
hash bucket: with b sign-planes the candidate set is ~n/2^b, the
standard IVF/LSH trade (recall measured against brute force in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import pround
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table

QUERY_VEC_ID = 0  # the corpus vector used as the search query

# ANN sketch geometry: 4 words × 64 bits = 256 random hyperplanes.
# Wider than the dedup sketches (60 bits) because kNN needs to RANK by
# estimated angle, not just bucket: with B bits the Hamming estimate of
# θ/π has σ = sqrt(p(1-p)/B) — 60 bits (±0.06) cannot separate rank-10
# from rank-200 in a near-orthogonal corpus, 256 bits (±0.03) can.
_ANN_WORDS = 4
_SHORTLIST = 128


def _ann_plane_signs(j: int) -> list[float]:
    """±1 weights of ANN plane j, derived from md5(f"ann-{j}") digest
    bits — deterministic, dependency-free, and unlimited in j (the
    arithmetic dedup family runs out of distinct patterns at 64)."""
    import hashlib

    digest = hashlib.md5(f"ann-{j}".encode()).digest()  # 128 bits >= 64 dims
    return [1.0 if (digest[d // 8] >> (d % 8)) & 1 else -1.0 for d in range(64)]


def attach_ann_sketches(df: DataFrame, keep_cols: list[str]) -> DataFrame:
    """keep_cols + (e double[64], w0..w3 bigint): 256 sign bits packed
    64-per-word in one Arrow mapInPandas pass (vectorized across rows
    and planes — same stage shape as dedup's attach_sketches)."""
    import numpy as np
    import pandas as pd

    S = np.array(
        [_ann_plane_signs(j) for j in range(_ANN_WORDS * 64)], dtype=np.float64
    ).T  # (64, 256)

    def compute(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (E @ S) > 0  # ranking only — no oracle, plain BLAS is fine
            out = {c: pdf[c].to_numpy() for c in keep_cols}
            out["e"] = list(map(list, E))
            for w in range(_ANN_WORDS):
                word = np.zeros(E.shape[0], dtype=np.uint64)
                for p in range(64):
                    word |= bits[:, w * 64 + p].astype(np.uint64) << np.uint64(p)
                out[f"w{w}"] = word.view(np.int64)
            yield pd.DataFrame(out)

    keep_schema = ", ".join(
        f"{name} {dtype}"
        for name, dtype in zip(keep_cols, [dict(df.dtypes)[c] for c in keep_cols])
    )
    schema = (
        keep_schema
        + ", e array<double>, "
        + ", ".join(f"w{w} bigint" for w in range(_ANN_WORDS))
    )
    return df.select(*keep_cols, "embedding").mapInPandas(compute, schema=schema)


def cosine_to_query(e_col: str, q_col: str) -> Column:
    """Cosine similarity between two double-array columns (sequential
    fold => bit-identical across engines after float->double cast)."""
    dot = F.aggregate(
        F.zip_with(F.col(e_col), F.col(q_col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(F.aggregate(F.col(e_col), F.lit(0.0), lambda a, v: a + v * v))
    n2 = F.sqrt(F.aggregate(F.col(q_col), F.lit(0.0), lambda a, v: a + v * v))
    return dot / (n1 * n2)


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


@query(
    "q_knn_cosine",
    oracle=(
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings "
        f"WHERE vec_id = {QUERY_VEC_ID}) "
        "SELECT vec_id, label, "
        + sql_round("list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe)", 6) + " AS cosine "
        f"FROM embeddings CROSS JOIN q WHERE vec_id <> {QUERY_VEC_ID} "
        "ORDER BY cosine DESC, vec_id LIMIT 10"
    ),
    tags=("similarity", "knn"),
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against a query vector (vec_id=0) —
    the exact ANN baseline. Broadcast 1-row query side; top-k planned
    as TakeOrderedAndProject (per-partition heaps, no global sort)."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding").alias("qe"))
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", _as_double("embedding").alias("e"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "q_knn_ivf",
    oracle=None,  # ANN: recall-vs-exact verified in pytest, not hash-equal
    tags=("similarity", "ann"),
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-rerank approximate nearest neighbours: every vector
    carries a 256-bit sign sketch (4 packed BIGINT words); candidate
    shortlist = top-128 by Hamming similarity to the query's sketch
    (popcount over XORed words — pure bit ops, TakeOrderedAndProject,
    no shuffle of vectors), exact cosine top-10 over the shortlist
    only.

    100 TB shape: the first pass reads 4 BIGINT sketch words per row
    instead of 64 floats (~87% scan-volume cut when sketches are
    materialized), stays in whole-stage codegen, and each partition
    contributes only its local top-128. Hamming over 256 random-plane
    bits estimates angle with σ ≈ 0.03·π — enough to rank moderate
    cosine levels, where bucket-equality probing (and narrower
    sketches) lose most of the true top-10."""
    e = load_table(spark, sf_dir, "embeddings")
    b = attach_ann_sketches(e, ["vec_id", "label"])
    qv = b.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe"),
        *[F.col(f"w{i}").alias(f"qw{i}") for i in range(_ANN_WORDS)],
    )
    hamming = None
    for i in range(_ANN_WORDS):
        h = F.bit_count(F.col(f"w{i}").bitwiseXOR(F.col(f"qw{i}")))
        hamming = h if hamming is None else (hamming + h)
    shortlist = (
        b.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qv))
        .withColumn("hamming", hamming)
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(_SHORTLIST)
    )
    return (
        shortlist.select(
            "vec_id",
            "label",
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


_BATCH_QUERY_IDS = tuple(range(8))  # the corpus vectors used as the query batch
_BATCH_TOPK = 10


@query(
    "q_knn_batch",
    oracle=None,  # ANN: per-query recall-vs-exact verified in pytest
    tags=("similarity", "ann", "batch"),
    eager=True,
)
def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query ANN — the shape a corpus pipeline actually
    runs (N query vectors at once, not one): per-partition local
    top-k against ALL queries in one Arrow pass, then one tiny shuffle.

    Plan (100 TB posture):
    1. The N query sketches + embeddings are captured driver-side (an
       N-row orchestration lookup, like SMOTE's class counts) and
       closure-broadcast into a single mapInPandas pass.
    2. Each input partition emits only its LOCAL top-128 candidates
       per query — ≤ 128·N·num_partitions tiny (q_id, vec_id,
       hamming) rows total, however large the corpus. The scan never
       shuffles and never expands the corpus N× (one XOR-popcount
       matrix op per Arrow batch covers all queries).
    3. One small shuffle ranks the local winners globally per query
       (window over ≤ 128·num_partitions rows per q_id).
    4. Exact cosine rerank joins the ≤ 128·N global shortlist
       (broadcast) back to the corpus for embeddings — top-10 each.

    Output: (q_id, vec_id, label, cosine), N·10 rows. Recall vs the
    exact per-query brute force is asserted in tests/test_ml.py."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    S = np.array(
        [_ann_plane_signs(j) for j in range(_ANN_WORDS * 64)], dtype=np.float64
    ).T  # (64, 256)

    # N-row driver-side lookup of the query batch: embeddings + sketches
    qpdf = (
        e.filter(F.col("vec_id").isin(*_BATCH_QUERY_IDS))
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    QE = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)  # (N, 64)
    qbits = (QE @ S) > 0  # (N, 256)
    qids = qpdf["vec_id"].to_numpy()
    n_q = len(qids)

    def local_topk(batches):
        K = _SHORTLIST
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (E @ S) > 0  # (n, 256)
            # Hamming distance of every row to every query in one op
            ham = (bits[:, None, :] != qbits[None, :, :]).sum(axis=2)  # (n, N)
            vec_ids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_h = [], [], []
            for qi in range(n_q):
                mask = vec_ids != qids[qi]
                cand_ids, cand_h = vec_ids[mask], ham[mask, qi]
                k = min(K, len(cand_ids))
                if k == 0:
                    continue
                idx = np.argpartition(cand_h, k - 1)[:k]
                out_q.append(np.full(k, qids[qi]))
                out_v.append(cand_ids[idx])
                out_h.append(cand_h[idx])
            if out_q:
                yield pd.DataFrame(
                    {
                        "q_id": np.concatenate(out_q),
                        "vec_id": np.concatenate(out_v),
                        "hamming": np.concatenate(out_h).astype(np.int64),
                    }
                )

    local = e.select("vec_id", "embedding").mapInPandas(
        local_topk, schema="q_id bigint, vec_id bigint, hamming bigint"
    )
    w_short = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    shortlist = (
        local.withColumn("rk", F.row_number().over(w_short))
        .filter(F.col("rk") <= _SHORTLIST)
        .select("q_id", "vec_id")
    )
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in QE[i]]) for i, q in enumerate(qids)],
        schema="q_id bigint, qe array<double>",
    )
    w_final = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        e.select("vec_id", "label", _as_double("embedding").alias("e"))
        .join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(qdf), "q_id")
        .select(
            "q_id",
            "vec_id",
            "label",
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(w_final))
        .filter(F.col("rk") <= _BATCH_TOPK)
        .select("q_id", "vec_id", "label", "cosine")
    )


_IVF_CELLS = 16
_IVF_NPROBE = 2


def ivf_search(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = _IVF_CELLS,
    nprobe: int = _IVF_NPROBE,
):
    """True IVF search: coarse k-means quantizer -> probe the nprobe
    nearest cells -> exact cosine only inside probed cells. Returns
    (result_df, assigned_df, probed_cell_ids) so tests can assert the
    defining invariant EXACTLY: the IVF result equals brute force
    restricted to the probed cells (the approximation is the cell
    pruning and nothing else).

    100 TB shape: the corpus is written partitioned BY CELL, a query
    reads only nprobe/n_cells of the data (partition pruning on the
    cell column), and the centroid table (n_cells × dim) is a driver/
    broadcast constant. Training the quantizer is one distributed
    KMeans fit over a sample. That persisted form is implemented by
    build_ivf_index / ivf_probe_persisted below (pruning + parity
    asserted in tests/test_ivf_index.py); this in-memory form is the
    driver-declared, side-effect-free twin. On the near-orthogonal synthetic
    embeddings recall is honestly modest (neighbors scatter across
    cells when there is no cluster structure) — measured and asserted
    with the sketch-rerank form (q_knn_ivf) as the better-recall
    default for structureless corpora."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", "label", _as_double("embedding").alias("e")
    ).withColumn("fv", array_to_vector(F.col("e")))
    km = KMeans(k=n_cells, seed=42, maxIter=20, featuresCol="fv", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "label", "e", "cell")

    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    q_emb = np.array(
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding"))
        .first()[0]
    )
    # cosine similarity of the query to each centroid (driver-side:
    # n_cells × dim floats — a constant, not data)
    norms = np.linalg.norm(centers, axis=1) * np.linalg.norm(q_emb)
    sims = centers @ q_emb / np.where(norms == 0, 1.0, norms)
    probed = [int(c) for c in np.argsort(-sims)[:nprobe]]

    qv = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding").alias("qe"))
    )
    result = (
        assigned.filter(F.col("cell").isin(probed))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )
    return result, assigned, probed


def build_ivf_index(
    spark: SparkSession, sf_dir: str, path: str, n_cells: int = _IVF_CELLS
) -> None:
    """Materialize the IVF index ivf_search recomputes per query: fit
    the same seeded coarse quantizer, write the assigned vectors
    hive-partitioned BY CELL (``{path}/vectors/cell=K/``) and the
    centroid table (n_cells × dim — model state, KBs) alongside at
    ``{path}/centroids``. This is the real 100 TB layout: the index is
    built once per corpus generation; every later probe is a
    partition-pruned read of nprobe/n_cells of the files (see
    ivf_probe_persisted), not a re-fit + full scan."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", "label", _as_double("embedding").alias("e")
    ).withColumn("fv", array_to_vector(F.col("e")))
    km = KMeans(k=n_cells, seed=42, maxIter=20, featuresCol="fv", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "label", "e", "cell")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/vectors")
    centers = [
        (int(i), [float(x) for x in np.asarray(c)])
        for i, c in enumerate(model.clusterCenters())
    ]
    spark.createDataFrame(centers, "cell int, center array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_probe_persisted(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    nprobe: int = _IVF_NPROBE,
) -> tuple[DataFrame, list[int]]:
    """Serve one ANN query from the persisted IVF index: rank cells by
    centroid cosine (driver-side math over the KB-sized centroid
    table), then scan ONLY the nprobe nearest cells' partitions — the
    ``cell.isin(probed)`` filter is static, so it reaches the reader as
    a PartitionFilter and the other n_cells - nprobe directories are
    never opened (asserted in tests/test_ivf_index.py). Within-cell
    search is exact cosine + deterministic top-10, identical to
    ivf_search's in-memory form. Returns (result, probed_cells)."""
    import numpy as np

    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(), key=lambda r: r.cell
    )
    centers = np.array([r.center for r in rows])
    e = load_table(spark, sf_dir, "embeddings")
    q_emb = np.array(
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding"))
        .first()[0]
    )
    norms = np.linalg.norm(centers, axis=1) * np.linalg.norm(q_emb)
    sims = centers @ q_emb / np.where(norms == 0, 1.0, norms)
    probed = [int(rows[i].cell) for i in np.argsort(-sims)[:nprobe]]

    qv = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding").alias("qe"))
    )
    result = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("cell").isin(probed))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )
    return result, probed


@query(
    "q_knn_ivf_coarse",
    oracle=None,  # k-means cells are model state — invariants tested instead
    tags=("similarity", "ann", "ivf"),
    eager=True,
)
def q_knn_ivf_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a coarse k-means quantizer (16 cells, probe 2):
    the classic inverted-file index — cell pruning cuts the scan to
    nprobe/n_cells of the corpus; the within-cell search is exact
    cosine. tests/test_ml.py asserts the pruning invariant exactly
    (result == brute force over probed cells) and measures recall."""
    result, _, _ = ivf_search(spark, sf_dir)
    return result


# --- q_pq_encode ------------------------------------------------------

# Product-quantization geometry: 64-dim vectors split into S=8
# subspaces of D=8 dims, K=16 centroids per subspace => one 4-bit code
# per subspace, packed into a 32-bit int. The codebook is a
# DETERMINISTIC constant (md5-derived, rounded to 6 dp so both engines
# parse the identical decimal literals) — a trained codebook would be
# model state delivered exactly the same way (broadcast constant).
_PQ_S, _PQ_D, _PQ_K = 8, 8, 16


def _pq_codebook() -> list[list[list[float]]]:
    import hashlib

    cb = []
    for s in range(_PQ_S):
        sub = []
        for j in range(_PQ_K):
            cs = []
            for d in range(_PQ_D):
                h = hashlib.md5(f"pq-{s}-{j}-{d}".encode()).digest()
                u = int.from_bytes(h[:4], "big") / 2**32
                cs.append(float(f"{u * 2 - 1:.6f}"))
            sub.append(cs)
        cb.append(sub)
    return cb


def _pq_sql_parts() -> tuple[str, list[str], str]:
    """Shared SQL pieces of the PQ encode: (codebook literal, per-
    subspace distance-table exprs d0..d7 referencing columns ``e`` and
    ``cb``, packed-code expr referencing d0..d7). Distances unroll the
    D=8 dims as a strictly sequential sum (((t0+t1)+t2)+...), matching
    the Spark side's sequential numpy accumulation; argmin is
    list_position(min) — first minimum, the same tie-break as numpy
    argmin."""
    cb = _pq_codebook()
    cb_lit = (
        "["
        + ", ".join(
            "[" + ", ".join("[" + ", ".join(f"{v:.6f}" for v in c) + "]" for c in sub) + "]"
            for sub in cb
        )
        + "]"
    )
    dists = []
    for s in range(_PQ_S):
        terms = []
        for d in range(_PQ_D):
            x = f"e[{s * _PQ_D + d + 1}]"
            c = f"cb[{s + 1}][j + 1][{d + 1}]"
            terms.append(f"({x} - {c}) * ({x} - {c})")
        acc = terms[0]
        for t in terms[1:]:
            acc = f"({acc} + {t})"
        dists.append(f"list_transform(range({_PQ_K}), j -> {acc}) AS d{s}")
    code = " + ".join(
        f"CAST(list_position(d{s}, list_min(d{s})) - 1 AS BIGINT) * {16 ** s}"
        for s in range(_PQ_S)
    )
    return cb_lit, dists, code


def _pq_oracle_sql() -> str:
    """DuckDB twin of q_pq_encode (see _pq_sql_parts for the
    sequential-sum / tie-break parity contract)."""
    cb_lit, dists, code = _pq_sql_parts()
    errs = [f"list_min(d{s})" for s in range(_PQ_S)]
    err = errs[0]
    for m in errs[1:]:
        err = f"({err} + {m})"
    return (
        f"WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, {cb_lit} AS cb "
        "FROM embeddings), "
        "d AS (SELECT vec_id, " + ", ".join(dists) + " FROM base) "
        f"SELECT vec_id, CAST({code} AS BIGINT) AS pq_code, "
        + sql_round(err, 6)
        + " AS recon_err FROM d"
    )


def _pq_encode_arrays(E):
    """(n, 64) float64 -> (pq_code int64[n], recon_err float64[n]).
    The one true encode: per subspace, distances accumulate
    dimension-sequentially ((0+t0)+t1..., bit-identical to the
    oracle's unrolled sequential sum), argmin = first minimum (the
    list_position tie-break). Shared by q_pq_encode and the ADC
    search so their codes can never drift."""
    import numpy as np

    C = np.array(_pq_codebook())  # (S, K, D) float64 from 6-dp literals
    n = E.shape[0]
    code = np.zeros(n, dtype=np.int64)
    err = np.zeros(n, dtype=np.float64)
    for s in range(_PQ_S):
        acc = np.zeros((n, _PQ_K), dtype=np.float64)
        for d in range(_PQ_D):
            diff = E[:, s * _PQ_D + d][:, None] - C[s, :, d][None, :]
            acc += diff * diff
        codes_s = np.argmin(acc, axis=1)  # first minimum, like list_position
        code += codes_s.astype(np.int64) * (16**s)
        err += acc[np.arange(n), codes_s]
    return code, err


def build_ivf_pq_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """IVF-PQ index: the build_ivf_index layout (vectors partitioned by
    cell + centroid side table) with each vector's 32-bit PQ code
    attached — the scan-side payload an ADC probe needs is then just
    (vec_id, pq_code): ~12 bytes/row instead of the 256-byte embedding,
    the memory-bandwidth win that makes IVF-PQ the standard billion-
    vector layout. Codes come from the oracle-pinned q_pq_encode."""
    build_ivf_index(spark, sf_dir, path)
    codes = q_pq_encode(spark, sf_dir).select("vec_id", "pq_code")
    vecs = spark.read.parquet(f"{path}/vectors").join(codes, "vec_id")
    vecs = vecs.localCheckpoint()  # sever lineage before overwriting the read path
    vecs.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/vectors")
    spark.catalog.refreshByPath(f"{path}/vectors")


def ivf_pq_probe(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    nprobe: int = _IVF_NPROBE,
    shortlist: int = _SHORTLIST,
) -> tuple[DataFrame, list[int]]:
    """Asymmetric-distance (ADC) IVF-PQ probe: rank cells by centroid
    cosine, scan ONLY the probed cells' (vec_id, pq_code) columns
    (partition-pruned + column-pruned — embeddings stay on disk),
    approximate each vector's squared-L2 distance to the query as
    Σ_s T[s][code_s] where T is the 8×16 per-subspace distance table
    computed driver-side (KB — model state), take the ADC shortlist,
    then rerank ONLY the shortlist by exact cosine against the real
    embeddings. The ADC sum is a codegen'd expression over broadcast
    literal arrays — no Python, no shuffle before the 64-row shortlist.

    Returns (top-10 DataFrame like q_knn_ivf_coarse, probed cells)."""
    import numpy as np

    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(), key=lambda r: r.cell
    )
    centers = np.array([r.center for r in rows])
    e = load_table(spark, sf_dir, "embeddings")
    q_emb = np.array(
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding"))
        .first()[0]
    )
    norms = np.linalg.norm(centers, axis=1) * np.linalg.norm(q_emb)
    sims = centers @ q_emb / np.where(norms == 0, 1.0, norms)
    probed = [int(rows[i].cell) for i in np.argsort(-sims)[:nprobe]]

    C = np.array(_pq_codebook())  # (S, K, D)
    qs = q_emb.reshape(_PQ_S, _PQ_D)
    T = ((C - qs[:, None, :]) ** 2).sum(axis=2)  # (S, K) distance table

    adc = None
    for s in range(_PQ_S):
        lut = F.array(*[F.lit(float(T[s, j])) for j in range(_PQ_K)])
        term = F.element_at(lut, F.expr(f"CAST((pq_code >> {4 * s}) & 15 AS INT) + 1"))
        adc = term if adc is None else adc + term
    short = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("cell").isin(probed))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", adc.alias("adc"))
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(shortlist)
    )
    qv = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding").alias("qe"))
    )
    rerank = (
        short.join(e.select("vec_id", "embedding"), "vec_id")
        .withColumn("e", _as_double("embedding"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )
    return rerank, probed


def append_ivf_pq(spark: SparkSession, path: str, new_vecs: DataFrame) -> list[int]:
    """Incremental IVF-PQ index append (VERDICT r6 #7): add new vectors
    to a persisted index WITHOUT a full rebuild, mirroring
    q_dedup_incremental's touched-partitions-only discipline
    (operators/incremental.py merge_sketch_index).

    The index's model state (k-means centroids + PQ codebook) is FROZEN
    at build time — the standard incremental-IVF contract (FAISS
    add_with_ids): new vectors are assigned to their nearest existing
    centroid and PQ-encoded with the existing codebook, so the appended
    index is bit-identical to one built from the union corpus with the
    same model state. ``new_vecs`` needs columns
    (vec_id bigint, label, e array<double>).

    Plan: ONE zero-shuffle Arrow pass does both assignment (argmin of
    squared-L2 over the 16 broadcast centroids, first-minimum
    tie-break — matching MLlib KMeans.transform) and PQ encoding
    (_pq_encode_arrays, the same function the build used — codes can
    never drift); a codegen expression tree would interpret at this
    width (the 60-dot lesson, SCALE.md). The hive-partitioned append
    then writes files ONLY under the touched ``cell=K/`` directories —
    untouched cells' files are never opened, let alone rewritten. At
    100 TB this is the difference between a per-batch index update and
    a nightly rebuild; small appended files are compacted by the same
    touched-cells-only pass (read cell=K, coalesce, overwrite cell=K).

    Returns the sorted list of touched cells (bounded by n_cells)."""
    import numpy as np
    import pandas as pd

    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(), key=lambda r: r.cell
    )
    cells = [int(r.cell) for r in rows]
    C_cent = np.array([r.center for r in rows])  # (n_cells, dim) — model state, KBs

    def assign_encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            d2 = ((E[:, None, :] - C_cent[None, :, :]) ** 2).sum(axis=2)
            cell_idx = np.argmin(d2, axis=1)  # first minimum = lowest cell id
            code, _ = _pq_encode_arrays(E)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "e": pdf["e"],
                    "pq_code": code,
                    "cell": np.array(cells, dtype=np.int64)[cell_idx],
                }
            )

    assigned = (
        new_vecs.select("vec_id", "label", "e")
        .mapInPandas(
            assign_encode,
            schema="vec_id bigint, label int, e array<double>, pq_code bigint, cell int",
        )
        # materialize ONCE: the touched-cell listing and the write reuse
        # the same Arrow pass instead of running it twice
        .localCheckpoint()
    )
    touched = sorted(r.cell for r in assigned.select("cell").distinct().collect())
    # file schema matches build_ivf_pq_index's (vec_id,label,e,pq_code
    # per file; cell is the directory) so probes read one layout
    assigned.write.mode("append").partitionBy("cell").parquet(f"{path}/vectors")
    spark.catalog.refreshByPath(f"{path}/vectors")
    return touched


@query(
    "q_pq_encode",
    oracle=_pq_oracle_sql(),
    tags=("similarity", "ann", "pq"),
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization encode — the compression step every vector
    store pairs with an IVF index (IVF-PQ): each 64-dim embedding is
    split into 8 subvectors, each assigned to the nearest of 16
    subspace centroids (squared-L2, first-minimum tie-break), and the
    eight 4-bit codes pack into one BIGINT. Also emits the
    reconstruction error (sum of per-subspace distances) — the
    quantization-quality metric a pipeline monitors.

    Scale: one zero-shuffle Arrow mapInPandas pass; the codebook
    (8×16×8 doubles — model state, KBs) is a closure constant, exactly
    how a trained codebook would broadcast. A 1024-term codegen
    expression tree would overflow whole-stage codegen and interpret
    (the 60-dot lesson in SCALE.md), so the numpy pass is the fast
    form: per subspace, distances accumulate dimension-sequentially
    ((0+t0)+t1..., bit-identical to the oracle's unrolled sequential
    sum) vectorized across rows and centroids."""
    import numpy as np
    import pandas as pd

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            code, err = _pq_encode_arrays(E)
            r6 = np.floor(err * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "pq_code": code, "recon_err": r6}
            )

    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(enc, schema="vec_id bigint, pq_code bigint, recon_err double")
    )


@query(
    "q_array_ops",
    oracle=(
        "SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, "
        + sql_round("list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)))", 6) + " AS head_sum, "
        + sql_round("sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))", 6) + " AS l2_norm, "
        + sql_round("list_max(list_transform(embedding, x -> CAST(x AS DOUBLE)))", 6) + " AS max_val "
        "FROM embeddings"
    ),
    tags=("array",),
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column operator surface: size, slice-sum, L2 norm via
    aggregate(fold), element max — the multimodal-column toolkit
    (embeddings travel through the engine as first-class arrays)."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = _as_double("embedding")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        pround(
            F.aggregate(F.slice(ed, 1, 4), F.lit(0.0), lambda a, v: a + v), 6
        ).alias("head_sum"),
        pround(
            F.sqrt(F.aggregate(ed, F.lit(0.0), lambda a, v: a + v * v)), 6
        ).alias("l2_norm"),
        pround(F.array_max(ed), 6).alias("max_val"),
    )


# --- q_knn_ivf_pq -----------------------------------------------------

# Declared (oracle-checkable) IVF-PQ geometry: the coarse quantizer is
# 4 deterministic md5 sign planes => 16 cells; a query probes its own
# cell plus every cell within Hamming distance 1 (5 of 16 — the same
# pruning fraction class as the persisted KMeans index's nprobe=2/16).
# KMeans cells are model state DuckDB cannot refit, so the persisted
# KMeans form lives in build_ivf_pq_index/ivf_pq_probe (exactness and
# partition pruning asserted in tests/test_ivf_index.py) while this
# sign-plane twin pins the ADC *search semantics* end-to-end against
# the oracle.
_IVFPQ_PLANES = 4
_IVFPQ_HAM = 1
_IVFPQ_SHORTLIST = 64


def _coarse_cell(e_expr: str = "e") -> Column:
    """16-cell deterministic coarse quantizer: bit j = sign of the dot
    product with md5 plane j, computed as the same sequential fold
    ((0+t1)+t2)... the oracle unrolls — bit-identical sign decisions.

    Composed as ONE SQL-text expression (round 17, VERDICT r16 #1):
    the old per-plane Column chain issued 4 x 64 F.lit py4j calls plus
    lambda plumbing (~1,330 commands, ~0.3 s per construction); the
    text form parses to the IDENTICAL Catalyst tree (rows, plan
    fingerprint and noop-exec wall pinned equal, measured interleaved)
    in ~9 commands / ~0.04 s. Double literals carry the D suffix.
    ``e_expr`` is the SQL expression of the double-array column."""
    bits = []
    for j in range(_IVFPQ_PLANES):
        arr = (
            "array("
            + ", ".join(f"{s:.1f}D" for s in _ann_plane_signs(j))
            + ")"
        )
        dot = (
            f"aggregate(zip_with({e_expr}, {arr}, (x, y) -> x * y), "
            "0.0D, (a, v) -> a + v)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {2**j} ELSE 0 END)")
    return F.expr("CAST(" + " + ".join(bits) + " AS INT)")


def _cell_sql_expr() -> str:
    """SQL form of _coarse_cell: the same sequential ±e[k] sums and
    sign decisions, shared by the IVF-PQ oracle and q_cell_balance."""

    def dot_sql(j: int) -> str:
        acc = "0.0"
        for k, s in enumerate(_ann_plane_signs(j)):
            acc = f"({acc} + (e[{k + 1}] * {s:.1f}))"
        return acc

    return " + ".join(
        f"(CASE WHEN {dot_sql(j)} > 0 THEN {2**j} ELSE 0 END)"
        for j in range(_IVFPQ_PLANES)
    )


def _ivf_pq_oracle_sql() -> str:
    """DuckDB twin of q_knn_ivf_pq: identical sign-plane cells (the
    same sequential ±e[k] sums), identical PQ codes (_pq_sql_parts),
    the identical 64-term sequential ADC sum, and the q_knn_cosine
    rerank form (list_cosine_similarity, proven hash-compatible with
    the Spark fold since round 4)."""
    cb = _pq_codebook()
    cb_lit, dists, code = _pq_sql_parts()
    cell = _cell_sql_expr()
    adc = None
    for s in range(_PQ_S):
        nib = f"((pq_code >> {4 * s}) & 15)"
        for d in range(_PQ_D):
            lst = "[" + ", ".join(f"{cb[s][j][d]:.6f}" for j in range(_PQ_K)) + "]"
            c = f"{lst}[{nib} + 1]"
            qd = f"qe[{s * _PQ_D + d + 1}]"
            term = f"(({qd} - {c}) * ({qd} - {c}))"
            adc = term if adc is None else f"({adc} + {term})"
    return (
        "WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e, "
        f"{cb_lit} AS cb FROM embeddings), "
        f"cells AS (SELECT vec_id, label, e, cb, ({cell}) AS cell FROM base), "
        f"q AS (SELECT e AS qe, cell AS qcell FROM cells WHERE vec_id = {QUERY_VEC_ID}), "
        "cand AS (SELECT c.vec_id, c.label, c.e, c.cb FROM cells c, q "
        f"WHERE c.vec_id <> {QUERY_VEC_ID} "
        f"AND bit_count(xor(c.cell, q.qcell)) <= {_IVFPQ_HAM}), "
        "d AS (SELECT vec_id, label, e, " + ", ".join(dists) + " FROM cand), "
        f"enc AS (SELECT vec_id, label, e, CAST({code} AS BIGINT) AS pq_code FROM d), "
        f"adc AS (SELECT vec_id, label, e, ({adc}) AS adc FROM enc, q), "
        f"short AS (SELECT vec_id, label, e FROM adc ORDER BY adc, vec_id "
        f"LIMIT {_IVFPQ_SHORTLIST}) "
        "SELECT s.vec_id, s.label, "
        + sql_round("list_cosine_similarity(s.e, q.qe)", 6)
        + " AS cosine FROM short s, q ORDER BY cosine DESC, s.vec_id LIMIT 10"
    )


@query(
    "q_knn_ivf_pq",
    oracle=_ivf_pq_oracle_sql(),
    tags=("similarity", "ann", "ivf", "pq"),
    eager=True,
)
def q_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ADC search, declared end-to-end: coarse-cell pruning →
    PQ codes for survivors only → asymmetric-distance shortlist →
    exact cosine rerank of ≤64 rows. The persisted-index twin
    (build_ivf_pq_index / ivf_pq_probe, tests/test_ivf_index.py) swaps
    the sign-plane quantizer for trained KMeans cells and reads codes
    from disk; search semantics here are identical and oracle-pinned.
    Ref parity target: the reference serves nearest-neighbour scoring
    lookups from its feature store (predict path, xai_tasks.py) — this
    is that lookup at corpus scale.

    100 TB shape: cell bits are a JVM fold over each row (at real
    scale they are PRECOMPUTED by build_ivf_pq_index and the filter
    becomes a partition prune — asserted there); only the ~5/16
    surviving fraction enters the Arrow encode pass; ADC is an 8-term
    codegen lookup per row against broadcast lists; nothing wider than
    (vec_id, label, code) shuffles before the 64-row shortlist."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("e")
    )
    base = e.withColumn("cell", _coarse_cell("e"))
    qrow = base.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe"), F.col("cell").alias("qcell")
    )
    cand = (
        base.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qrow))
        .filter(
            F.bit_count(F.col("cell").bitwiseXOR(F.col("qcell"))) <= _IVFPQ_HAM
        )
        .select("vec_id", "label", "e")
    )

    def attach(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            code, _ = _pq_encode_arrays(E)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "e": pdf["e"],
                    "pq_code": code,
                }
            )

    coded = cand.mapInPandas(
        attach, schema="vec_id bigint, label int, e array<double>, pq_code bigint"
    )
    # ADC: sequential 64-term sum (s-major, d-minor) — the identical
    # association order as the oracle string, so the doubles match
    # bit-for-bit and the shortlist cut can never disagree.
    # Composed as ONE SQL-text expression (round 17, VERDICT r16 #1):
    # the Column-chain form issued 4x16 F.lit calls per (s,d) term
    # (~5,850 py4j commands, ~1 s per construction); the text parses
    # to the identical Catalyst tree (shortlist rows and exec wall
    # pinned equal, measured interleaved) in 3 commands. Literals are
    # repr()-rendered with the D suffix (shortest round-trip decimal,
    # correctly-rounded strtod => identical double bits to F.lit).
    # shiftright(), not the >> operator: >> fails to parse inside a
    # function-argument context (same ShiftRight node either way).
    cb = _pq_codebook()
    adc_terms = []
    for s in range(_PQ_S):
        nib = f"(CAST(shiftright(pq_code, {4 * s}) & 15 AS INT) + 1)"
        for d in range(_PQ_D):
            arr = (
                "array("
                + ", ".join(f"{cb[s][j][d]!r}D" for j in range(_PQ_K))
                + ")"
            )
            c = f"element_at({arr}, {nib})"
            qd = f"element_at(qe, {s * _PQ_D + d + 1})"
            adc_terms.append(f"(({qd} - {c}) * ({qd} - {c}))")
    adc = F.expr(" + ".join(adc_terms))
    short = (
        coded.crossJoin(F.broadcast(qrow.select("qe")))
        .withColumn("adc", adc)
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(_IVFPQ_SHORTLIST)
    )
    return (
        short.select(
            "vec_id", "label", pround(cosine_to_query("e", "qe"), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


_HN_ANCHORS = 8  # anchors = vec_id 0..7 (deterministic subset)


@query(
    "q_hard_negatives",
    oracle=(
        f"WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label, "
        "CAST(embedding AS DOUBLE[]) AS ae FROM embeddings "
        f"WHERE vec_id < {_HN_ANCHORS}), "
        "c AS (SELECT a.anchor_id, e.vec_id AS neg_id, e.label AS neg_label, "
        + sql_round(
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), a.ae)", 6
        )
        + " AS cosine "
        "FROM embeddings e CROSS JOIN a "
        "WHERE e.label <> a.anchor_label), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id "
        "ORDER BY cosine DESC, neg_id) AS rk FROM c) "
        "SELECT anchor_id, neg_id, neg_label, cosine FROM r WHERE rk = 1"
    ),
    tags=("similarity", "ml", "mining"),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    embedding, the MOST similar vector carrying a DIFFERENT label —
    the negatives that actually teach a metric-learning model
    (random negatives are trivially separable; the hard ones sit at
    the decision boundary). Standard step in embedding-model and
    reranker training pipelines over exactly this kind of
    (vector, label) table.

    Scale shape: the 8 anchor vectors broadcast (bounded metadata, the
    q_knn_batch discipline); similarity is the sequential-fold
    zip_with dot product (engine-exact, see cosine_to_query); the
    top-1-per-anchor window partitions by anchor. At corpus scale the
    exact scan swaps for the IVF/PQ index probes (same module) with
    a label-filtered rerank."""
    e = load_table(spark, sf_dir, "embeddings")
    anchors = (
        e.filter(F.col("vec_id") < _HN_ANCHORS)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            _as_double("embedding").alias("ae"),
        )
    )
    cand = (
        e.select(
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            _as_double("embedding").alias("ne"),
        )
        .crossJoin(F.broadcast(anchors))
        .filter(F.col("neg_label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "neg_id",
            "neg_label",
            pround(cosine_to_query("ne", "ae"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


_NDCG_K = 10


@query(
    "q_ndcg",
    oracle=(
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe, label AS ql "
        f"FROM embeddings WHERE vec_id = {QUERY_VEC_ID}), "
        "r AS (SELECT vec_id, "
        "CASE WHEN label = ql THEN 1 ELSE 0 END AS rel, "
        + sql_round(
            "list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe)", 6
        )
        + " AS cosine "
        f"FROM embeddings CROSS JOIN q WHERE vec_id <> {QUERY_VEC_ID}), "
        "rk AS (SELECT rel, ROW_NUMBER() OVER "
        "(ORDER BY cosine DESC, vec_id) AS rnk FROM r), "
        "nrel AS (SELECT CAST(SUM(rel) AS BIGINT) AS n_rel FROM rk), "
        "dcg AS (SELECT CAST(SUM(CAST(FLOOR(rel * 1000000000 / log2(rnk + 1) "
        "+ 0.5) AS BIGINT)) AS DOUBLE) / 1000000000 AS dcg "
        f"FROM rk WHERE rnk <= {_NDCG_K}), "
        "ideal AS (SELECT CAST(SUM(CAST(FLOOR(1000000000 / log2(i + 1) + 0.5) "
        "AS BIGINT)) AS DOUBLE) / 1000000000 AS idcg "
        f"FROM range(1, {_NDCG_K} + 1) t(i), nrel "
        f"WHERE i <= LEAST({_NDCG_K}, n_rel)) "
        "SELECT nrel.n_rel, "
        + sql_round("dcg.dcg", 6) + " AS dcg, "
        + sql_round("ideal.idcg", 6) + " AS idcg, "
        + sql_round("dcg.dcg / ideal.idcg", 6) + " AS ndcg "
        "FROM nrel, dcg, ideal"
    ),
    tags=("similarity", "retrieval", "metric"),
)
def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the brute-force cosine retrieval, with same-label
    membership as binary relevance: rank the corpus by similarity to
    the query vector (vec_id=0), score the top-10 by
    Σ rel_i / log2(rank_i + 1), normalize by the ideal ordering —
    the standard offline metric for an embedding-retrieval stack
    (complements test-side recall@k with a rank-position-weighted,
    hash-checkable number; label-match relevance is the same oracle
    convention the ANN recall tests use).

    Exactness: the ranking reuses q_knn_cosine's proven-identical
    6-dp cosine + vec_id tie-break, so ranks are identical integers;
    each 1/log2(rank+1) term folds to 1e-9 fixed-point BEFORE the
    sum (the q_chi2 discipline — a float Σ's partial order could
    flip the 6-dp round), and the ideal DCG folds the same way over
    1..min(k, n_rel).

    Scale: one broadcast of the 1-row query vector, one codegen'd
    zip_with/aggregate cosine pass, a top-k-bounded window on the
    6-dp-rounded score. The corpus never shuffles beyond the rank's
    single-partition tail (bounded: only rows needed for rank ≤ k
    matter at scale — swap the window for TakeOrdered at 100 TB)."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        _as_double("embedding").alias("qe"), F.col("label").alias("ql")
    )
    r = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", _as_double("embedding").alias("e"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            (F.col("label") == F.col("ql")).cast("int").alias("rel"),
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    rk = r.select("rel", F.row_number().over(w).alias("rnk"))
    agg = rk.agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        (
            F.sum(
                F.when(
                    F.col("rnk") <= _NDCG_K,
                    F.floor(
                        F.col("rel") * 1000000000 / F.log2(F.col("rnk") + 1)
                        + F.lit(0.5)
                    ).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).cast("double")
            / 1000000000
        ).alias("dcg"),
    )
    k = F.least(F.lit(_NDCG_K), F.col("n_rel")).cast("int")
    # guard n_rel = 0 (ADVICE r8): Spark's sequence(1, 0) auto-steps to
    # [1, 0] and the i = 0 term divides by log2(1) = 0 (Infinity ->
    # saturated bigint) where the oracle's range filter yields an empty
    # SUM = NULL — match the oracle's NULL on a corpus with no
    # same-label docs.
    idcg = F.when(
        F.col("n_rel") > 0,
        F.aggregate(
            F.sequence(F.lit(1), k),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + F.floor(1000000000 / F.log2(i + 1) + F.lit(0.5)).cast("bigint"),
        ).cast("double")
        / 1000000000,
    )
    return agg.select(
        "n_rel",
        pround(F.col("dcg"), 6).alias("dcg"),
        pround(idcg, 6).alias("idcg"),
        pround(F.col("dcg") / idcg, 6).alias("ndcg"),
    )


@query(
    "q_embedding_isotropy",
    oracle=(
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
        "FROM embeddings), "
        "ex AS (SELECT vec_id, unnest(e) AS x, "
        "unnest(generate_series(1, len(e))) AS i FROM v), "
        "nrm AS (SELECT vec_id, "
        "SQRT(SUM(CAST(FLOOR(x * x * 1000000000000 + 0.5) AS BIGINT)) "
        "/ 1000000000000.0) AS nrm FROM ex GROUP BY vec_id), "
        "uu AS (SELECT i, SUM(CAST(FLOOR(x / nrm * 1000000000 + 0.5) "
        "AS BIGINT)) AS s FROM ex JOIN nrm USING (vec_id) GROUP BY i), "
        "q AS (SELECT SUM(CAST(s AS HUGEINT) * s) AS ss FROM uu), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "SUM(CAST(FLOOR(nrm * 1000000000 + 0.5) AS BIGINT)) AS sn FROM nrm) "
        "SELECT nn.n, "
        + sql_round("sn / 1000000000.0 / n", 6) + " AS mean_norm, "
        + sql_round(
            "(CAST(ss AS DOUBLE) / 1e18 - n) / (CAST(n AS DOUBLE) * (n - 1))", 6
        )
        + " AS mean_cosine "
        "FROM nn, q"
    ),
    tags=("similarity", "quality", "stats"),
)
def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy diagnostic: corpus size, mean vector
    norm, and the mean pairwise cosine over all i≠j — computed WITHOUT
    the n² pair join via the sum-vector identity
    Σ_{i≠j} cos(i,j) = ‖Σ u_i‖² − n (u = unit vectors), so the whole
    statistic is one O(n·d) pass. A high mean cosine means the space
    has collapsed toward a common direction (the anisotropy problem of
    contextual embeddings — Ethayarajh 2019) and cosine retrieval /
    near-dup thresholds degrade; this is the QA gate an embedding
    pipeline runs before trusting q_knn_* or q_semdedup outputs.

    Exactness: each per-component square folds to 1e-12 fixed-point
    BEFORE the norm sum and each unit component to 1e-9 before the
    per-dimension sum, so every aggregate is an exact integer sum
    (order-free); ‖Σu‖² is an exact DECIMAL/HUGEINT dot of those
    integers. No float ever crosses an aggregation boundary — the
    engine-parity discipline the similarity family established with
    sequential-fold cosines, applied to corpus-level moments.

    Scale: explode to (n·d) rows, two hash aggregates (by vec, by
    dim), a d-row dot product — linear in corpus size, shuffle keyed
    on vec_id then dim. The naive pairwise mean is O(n²) and dies at
    a million vectors; this runs at a billion."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode(_as_double("embedding")).alias("i", "x")
    )
    nrm = ex.groupBy("vec_id").agg(
        F.sqrt(
            F.sum(
                F.floor(F.col("x") * F.col("x") * 1000000000000 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            / F.lit(1000000000000.0)
        ).alias("nrm")
    )
    uu = (
        ex.join(nrm, "vec_id")
        .groupBy("i")
        .agg(
            F.sum(
                F.floor(F.col("x") / F.col("nrm") * 1000000000 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("s")
        )
    )
    q = uu.agg(F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("ss"))
    nn = nrm.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.floor(F.col("nrm") * 1000000000 + F.lit(0.5)).cast("bigint")
        ).alias("sn"),
    )
    return nn.crossJoin(F.broadcast(q)).select(
        "n",
        pround(F.col("sn") / 1000000000.0 / F.col("n"), 6).alias("mean_norm"),
        pround(
            (F.col("ss").cast("double") / 1e18 - F.col("n"))
            / (F.col("n").cast("double") * (F.col("n") - 1)),
            6,
        ).alias("mean_cosine"),
    )


def _cell_balance_oracle() -> str:
    cell = _cell_sql_expr()
    return (
        "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
        "FROM embeddings), "
        f"cells AS (SELECT vec_id, ({cell}) AS cell FROM base), "
        "g AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM cells "
        "GROUP BY cell), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, "
        "CAST(SUM(n) AS BIGINT) AS n_vectors, "
        "CAST(MIN(n) AS BIGINT) AS min_size, "
        "CAST(MAX(n) AS BIGINT) AS max_size, "
        "SUM(CAST(n AS HUGEINT) * n) AS ss FROM g) "
        "SELECT n_cells, n_vectors, min_size, max_size, "
        + sql_round("max_size * 1.0 * n_cells / n_vectors", 6)
        + " AS imbalance, "
        + sql_round(
            "SQRT(CAST(ss AS DOUBLE) * n_cells / "
            "(CAST(n_vectors AS DOUBLE) * n_vectors) - 1)",
            6,
        )
        + " AS size_cv FROM s"
    )


@query(
    "q_cell_balance",
    oracle=_cell_balance_oracle(),
    tags=("similarity", "ann", "monitor"),
)
def q_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index health: the cell-size balance of the coarse quantizer
    (occupied cells, min/max cell size, imbalance = max/mean, and the
    size coefficient of variation) — the metric that decides whether
    an IVF index's nprobe pruning actually prunes. A perfectly
    balanced 16-cell index scans 1/16 of the data per probed cell; at
    imbalance 8 the hot cell holds half the corpus and every query
    that probes it degrades toward a full scan (then you re-train the
    quantizer or split the cell). Uses the SAME deterministic
    sign-plane quantizer as q_knn_ivf_pq, so this monitors exactly the
    geometry the declared search uses; the persisted-KMeans index gets
    the same check from its hive cell= layout at write time.

    Exactness: cell ids are integer sign decisions off the shared
    sequential fold; all sizes and Σn² are exact integers
    (DECIMAL/HUGEINT); CV = √(E[n²]/E[n]² − 1) is a fixed IEEE chain
    on them.

    Scale: one codegen'd cell pass + a 16-row aggregate — the whole
    health check is O(n·planes) with a constant-size reduction."""
    e = load_table(spark, sf_dir, "embeddings")
    cells = e.select(_as_double("embedding").alias("e")).select(
        _coarse_cell("e").alias("cell")
    )
    g = cells.groupBy("cell").agg(F.count("*").cast("bigint").alias("n"))
    s = g.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.min("n").alias("min_size"),
        F.max("n").alias("max_size"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("ss"),
    )
    nv = F.col("n_vectors").cast("double")
    return s.select(
        "n_cells",
        "n_vectors",
        "min_size",
        "max_size",
        pround(F.col("max_size") * 1.0 * F.col("n_cells") / F.col("n_vectors"), 6).alias(
            "imbalance"
        ),
        pround(
            F.sqrt(F.col("ss").cast("double") * F.col("n_cells") / (nv * nv) - 1),
            6,
        ).alias("size_cv"),
    )


@query(
    "q_embedding_outlier",
    oracle=(
        "WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e "
        "FROM embeddings), "
        "ex AS (SELECT vec_id, label, unnest(e) AS x, "
        "unnest(generate_series(1, len(e))) AS i FROM v), "
        "fx AS (SELECT vec_id, label, i, x, "
        "CAST(FLOOR(x * 1000000000 + 0.5) AS BIGINT) AS xi FROM ex), "
        "c AS (SELECT label, i, CAST(SUM(xi) AS BIGINT) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS m FROM fx GROUP BY label, i), "
        "d AS (SELECT f.vec_id, f.label, "
        "SQRT(SUM(CAST(FLOOR((f.x - CAST(c.s AS DOUBLE) / 1000000000 / c.m) "
        "* (f.x - CAST(c.s AS DOUBLE) / 1000000000 / c.m) "
        "* 1000000000000 + 0.5) AS BIGINT)) / 1000000000000.0) AS dist "
        "FROM fx f JOIN c ON f.label = c.label AND f.i = c.i "
        "GROUP BY f.vec_id, f.label) "
        "SELECT vec_id, label, " + sql_round("dist", 6) + " AS dist "
        "FROM d ORDER BY dist DESC, vec_id LIMIT 10"
    ),
    tags=("similarity", "quality", "outlier"),
)
def q_embedding_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label embedding outliers: the 10 vectors farthest (L2)
    from their own label's centroid — mislabeled or corrupted
    training vectors surface here first, making this the row-level
    QA companion to q_embedding_isotropy's corpus-level diagnostic
    (and the cheap precursor to q_semdedup's centroid geometry:
    same centroids, opposite tail).

    Exactness: per-component values fold to 1e-9 fixed-point BEFORE
    the centroid sums (exact integer sums, order-free), so each
    centroid is an exact rational; each squared deviation folds to
    1e-12 fixed-point before the per-vector sum — no float ever
    crosses an aggregation boundary (the q_embedding_isotropy
    discipline), and the top-10 cut compares identical IEEE doubles
    with a vec_id tie-break.

    Scale: explode to n·d rows, one (label, dim) centroid aggregate
    (bounded by |labels|·d, broadcast back), one per-vector fold,
    TakeOrderedAndProject for the top-10 — linear in corpus size, no
    pair join anywhere."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode(_as_double("embedding")).alias("i", "x")
    )
    fx = ex.withColumn(
        "xi", F.floor(F.col("x") * 1000000000 + F.lit(0.5)).cast("bigint")
    )
    c = fx.groupBy("label", "i").agg(
        F.sum("xi").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("m"),
    )
    dev = F.col("x") - F.col("s").cast("double") / 1000000000 / F.col("m")
    d = (
        fx.join(F.broadcast(c), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            # dev*dev, not POWER(dev,2): Math.pow is not guaranteed
            # correctly rounded (1-ulp risk at the fixed-point floor
            # boundary); IEEE multiplication is.
            F.sqrt(
                F.sum(
                    F.floor(dev * dev * 1000000000000 + F.lit(0.5)).cast(
                        "bigint"
                    )
                )
                / F.lit(1000000000000.0)
            ).alias("dist")
        )
    )
    return (
        d.select("vec_id", "label", pround(F.col("dist"), 6).alias("dist"))
        .orderBy(F.desc("dist"), F.asc("vec_id"))
        .limit(10)
    )


_MMR_POOL = 20
_MMR_K = 5
_MMR_LAMBDA = 0.5


def _mmr_oracle() -> str:
    """Unrolled-CTE DuckDB twin of the fixed-5-round MMR selection
    (the _pagerank_oracle treatment applied to a greedy re-ranker):
    candidate pool and pairwise sims MATERIALIZED once, then one
    (penalty, argmax) CTE pair per round over the 20-row pool."""
    rel = sql_round(
        "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)", 6
    )
    sim = sql_round(
        "list_cosine_similarity(a.ea, b.eb)", 6
    )
    lam, om = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    parts = [
        "WITH q AS MATERIALIZED (SELECT CAST(embedding AS DOUBLE[]) AS qe "
        f"FROM embeddings WHERE vec_id = {QUERY_VEC_ID}), "
        f"cand AS MATERIALIZED (SELECT vec_id, {rel} AS rel "
        f"FROM embeddings e CROSS JOIN q WHERE vec_id <> {QUERY_VEC_ID} "
        f"ORDER BY rel DESC, vec_id LIMIT {_MMR_POOL}), "
        "ca AS MATERIALIZED (SELECT c.vec_id AS va, "
        "CAST(e.embedding AS DOUBLE[]) AS ea FROM cand c "
        "JOIN embeddings e USING (vec_id)), "
        "cb AS MATERIALIZED (SELECT va AS vb, ea AS eb FROM ca), "
        f"pair AS MATERIALIZED (SELECT va, vb, {sim} AS sim "
        "FROM ca a JOIN cb b ON va <> vb), "
        "sel1 AS MATERIALIZED (SELECT vec_id, rel, CAST(0 AS DOUBLE) AS pen, "
        f"{lam} * rel AS sc FROM cand ORDER BY rel DESC, vec_id LIMIT 1), "
        "acc1 AS MATERIALIZED (SELECT vec_id, rel FROM sel1), ",
    ]
    for t in range(2, _MMR_K + 1):
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT c.vec_id, c.rel, "
            "MAX(p.sim) AS pen FROM cand c "
            "JOIN pair p ON p.va = c.vec_id "
            f"JOIN acc{t - 1} s ON p.vb = s.vec_id "
            f"WHERE c.vec_id NOT IN (SELECT vec_id FROM acc{t - 1}) "
            "GROUP BY c.vec_id, c.rel), "
            f"sel{t} AS MATERIALIZED (SELECT vec_id, rel, pen, "
            f"{lam} * rel - {om} * pen AS sc FROM p{t} "
            "ORDER BY sc DESC, vec_id LIMIT 1), "
            f"acc{t} AS MATERIALIZED (SELECT vec_id, rel FROM acc{t - 1} "
            f"UNION ALL SELECT vec_id, rel FROM sel{t}), ",
        )
    parts[-1] = parts[-1].rstrip(", ") + " "
    sel = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS mmr_rank, vec_id, rel, pen, sc "
        f"FROM sel{t}"
        for t in range(1, _MMR_K + 1)
    )
    parts.append(
        "SELECT mmr_rank, vec_id, "
        + sql_round("rel", 6) + " AS relevance, "
        + sql_round("pen", 6) + " AS penalty, "
        + sql_round("sc", 6) + " AS mmr_score FROM (" + sel + ")"
    )
    return "".join(parts)


@query(
    "q_mmr",
    oracle=_mmr_oracle(),
    tags=("similarity", "retrieval", "iterative"),
    eager=True,
)
def q_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick 5 of the top-20 cosine candidates, each round
    maximizing λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) with
    λ = 0.5 — the diversity-aware retrieval head that complements
    q_knn_cosine's pure-relevance top-k and q_rrf's rank fusion
    (three re-rankers over the same embedding stack).

    Exactness: relevance and pairwise sims are 6-dp-rounded
    sequential-fold cosines (the proven-identical q_knn_cosine
    machinery), so every score is the same IEEE double on both
    engines and every argmax (vec_id tie-break) picks the same
    vector; the oracle unrolls the 5 greedy rounds as MATERIALIZED
    CTEs.

    Scale: ONE distributed top-20 pass over the corpus
    (TakeOrderedAndProject, the q_knn_cosine plan) bounds everything
    downstream; the greedy selection itself runs driver-side on the
    collected pool — ≤20 (vec_id, rel) rows plus the 20 pool vectors,
    provably bounded metadata (the band-table / centroid precedent) —
    with the SAME sequential-fold double arithmetic and 6-dp
    rounding, so the picks are bit-identical to a fully declarative
    formulation while costing 2 Spark jobs instead of ~10. The corpus
    is never touched again after the candidate pass."""
    import math as _math

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        _as_double("embedding").alias("qe")
    )
    cand_rows = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", _as_double("embedding").alias("e"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", pround(cosine_to_query("e", "qe"), 6).alias("rel")
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .collect()
    )
    pool_ids = [r.vec_id for r in cand_rows]
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id").isin(pool_ids))
        .select("vec_id", "embedding")
        .collect()
    }

    def _round6(x: float) -> float:
        return _math.floor(x * 1e6 + 0.5) / 1e6  # functions.pround, exactly

    def _cos(a: list[float], b: list[float]) -> float:
        # same sequential fold as cosine_to_query — identical IEEE
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return dot / (_math.sqrt(na) * _math.sqrt(nb))

    sim = {
        (a, b): _round6(_cos(vecs[a], vecs[b]))
        for a in pool_ids
        for b in pool_ids
        if a != b
    }
    rel = {r.vec_id: r.rel for r in cand_rows}
    lam, om = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    picked: list[tuple] = []
    remaining = list(pool_ids)
    for t in range(1, _MMR_K + 1):
        scored = []
        for v in remaining:
            pen = max(sim[(v, s)] for _, s, *_ in picked) if picked else 0.0
            scored.append((-(lam * rel[v] - om * pen), v, pen))
        scored.sort()
        neg_sc, v, pen = scored[0]
        picked.append((t, v, rel[v], pen, -neg_sc))
        remaining.remove(v)
    return spark.createDataFrame(
        [
            (t, v, _round6(r), _round6(p), _round6(s))
            for t, v, r, p, s in picked
        ],
        "mmr_rank bigint, vec_id bigint, relevance double, penalty double, "
        "mmr_score double",
    )


# ---------------------------------------------------------------------------
# Mean reciprocal rank (round 10): the multi-query retrieval metric
# missing between q_ndcg (single-query, rank-position-weighted) and
# q_rrf (rank FUSION, not a metric) — "how high does the first
# relevant hit land, averaged over a query panel", the number an
# embedding-retrieval stack reports next to recall@k.
# ---------------------------------------------------------------------------

_MRR_QUERIES = 10


def _mrr_oracle() -> str:
    return (
        "WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe, "
        f"label AS ql FROM embeddings WHERE vec_id < {_MRR_QUERIES}), "
        "r AS MATERIALIZED (SELECT qid, vec_id, "
        "CASE WHEN label = ql THEN 1 ELSE 0 END AS rel, "
        + sql_round(
            "list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe)", 6
        )
        + " AS cosine FROM embeddings CROSS JOIN qs WHERE vec_id <> qid), "
        "rk AS (SELECT qid, rel, ROW_NUMBER() OVER "
        "(PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk FROM r), "
        "fr AS (SELECT qid, CAST(MIN(rnk) AS BIGINT) AS frank FROM rk "
        "WHERE rel = 1 GROUP BY qid), "
        "qn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM qs), "
        "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_with_rel, "
        "CAST(SUM(CAST(FLOOR(1000000000.0 / frank + 0.5) AS BIGINT)) "
        "AS BIGINT) AS units FROM fr) "
        "SELECT n_queries, n_with_rel, "
        + sql_round("CAST(units AS DOUBLE) / 1000000000 / n_queries", 6)
        + " AS mrr FROM qn, a"
    )


@query(
    "q_mrr",
    oracle=_mrr_oracle(),
    tags=("similarity", "retrieval", "metric"),
)
def q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank over a 10-query panel (vec_id 0..9),
    same-label relevance, brute-force cosine ranking: per query the
    rank of the FIRST relevant corpus vector under the proven
    (6-dp cosine DESC, vec_id) order, RR = 1/rank (0 when a query has
    no same-label corpus vector — still counted in the denominator),
    MRR = mean over the panel.

    Exactness: ranks reuse q_knn_cosine's engine-identical 6-dp
    cosine + vec_id tie-break; each reciprocal folds to 1e-9
    fixed-point units BEFORE the sum (the q_chi2 discipline), so the
    mean is exact-integer / constant.

    Scale: NO ranking window at all — the first-relevant rank is two
    aggregates: (1) per query, the lexicographic max over relevant
    rows of struct(cosine, -vec_id) picks the first-ranked relevant
    item; (2) its rank = 1 + count of rows ordering strictly before
    it. Both are map-side-combinable folds over the broadcast-panel
    cosine pass (paid twice — the q_ndcg window's single-partition
    tail is what this shape removes at 100 TB), then everything is
    <=|panel| rows."""
    e = load_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < _MRR_QUERIES).select(
        F.col("vec_id").alias("qid"),
        _as_double("embedding").alias("qe"),
        F.col("label").alias("ql"),
    )
    scored = (
        e.select("vec_id", "label", _as_double("embedding").alias("ce"))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (F.col("label") == F.col("ql")).cast("int").alias("rel"),
            pround(cosine_to_query("ce", "qe"), 6).alias("cosine"),
        )
    )
    best = (
        scored.filter(F.col("rel") == 1)
        .groupBy("qid")
        .agg(
            F.max(
                F.struct(F.col("cosine"), (-F.col("vec_id")).alias("nv"))
            ).alias("b")
        )
    )
    before = (F.col("cosine") > F.col("b.cosine")) | (
        (F.col("cosine") == F.col("b.cosine")) & (F.col("vec_id") < -F.col("b.nv"))
    )
    fr = (
        scored.join(F.broadcast(best), "qid")
        .groupBy("qid")
        .agg(
            (F.lit(1) + F.sum(F.when(before, 1).otherwise(0)))
            .cast("bigint")
            .alias("frank")
        )
    )
    qn = qs.agg(F.count("*").cast("bigint").alias("n_queries"))
    a = fr.agg(
        F.count("*").cast("bigint").alias("n_with_rel"),
        F.sum(
            F.floor(F.lit(1000000000.0) / F.col("frank") + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("units"),
    )
    return a.crossJoin(F.broadcast(qn)).select(
        "n_queries",
        "n_with_rel",
        pround(
            F.col("units").cast("double") / 1000000000 / F.col("n_queries"), 6
        ).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# Mean average precision (round 11, VERDICT r10 #5a): the last missing
# member of the retrieval-eval battery (q_ndcg / q_mrr / q_rrf / AP) —
# per-query AVERAGE precision over ALL relevant items, not just the
# first (q_mrr) or a position-discounted gain (q_ndcg), mean'd over
# the same 10-query panel.
# ---------------------------------------------------------------------------


def _panel_relevant_ranks(spark: SparkSession, sf_dir: str):
    """Shared rank machinery for q_map / q_recall_at_k: per panel
    query (vec_id < _MRR_QUERIES, same-label relevance), the overall
    rank r_rank and relevant-index i_rel of EVERY relevant corpus
    vector under the proven (6-dp cosine DESC, vec_id) order — ranks
    decomposed as (prefix over the DOMAIN-bounded per-(qid, cosine)
    count table) + (position inside a window PARTITIONED by tie
    group), never a per-query global ranking window. Returns
    (qs panel, relevant rows with qid/vec_id/r_rank/i_rel)."""
    e = load_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < _MRR_QUERIES).select(
        F.col("vec_id").alias("qid"),
        _as_double("embedding").alias("qe"),
        F.col("label").alias("ql"),
    )
    scored = (
        e.select("vec_id", "label", _as_double("embedding").alias("ce"))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (F.col("label") == F.col("ql")).cast("int").alias("rel"),
            pround(cosine_to_query("ce", "qe"), 6).alias("cosine"),
        )
    )
    # prefix counts over the DOMAIN-bounded per-(qid, cosine) table
    per = scored.groupBy("qid", "cosine").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("rel").cast("bigint").alias("rcnt"),
    )
    w_pre = (
        Window.partitionBy("qid")
        .orderBy(F.desc("cosine"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per.select(
        "qid",
        "cosine",
        F.coalesce(F.sum("cnt").over(w_pre), F.lit(0)).alias("before_n"),
        F.coalesce(F.sum("rcnt").over(w_pre), F.lit(0)).alias("before_r"),
    )
    # within-tie positions: windows partitioned by the tie group
    w_tie = Window.partitionBy("qid", "cosine").orderBy("vec_id")
    w_tie_pre = w_tie.rowsBetween(Window.unboundedPreceding, -1)
    x = (
        scored.withColumn("tp", F.row_number().over(w_tie) - 1)
        .withColumn(
            "trp", F.coalesce(F.sum("rel").over(w_tie_pre), F.lit(0))
        )
        .filter(F.col("rel") == 1)
        .join(cum, ["qid", "cosine"])
        .select(
            "qid",
            "vec_id",
            (F.col("before_n") + F.col("tp") + 1).cast("bigint").alias("r_rank"),
            (F.col("before_r") + F.col("trp") + 1).cast("bigint").alias("i_rel"),
        )
    )
    return qs, x


def _map_oracle() -> str:
    return (
        "WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe, "
        f"label AS ql FROM embeddings WHERE vec_id < {_MRR_QUERIES}), "
        "r AS MATERIALIZED (SELECT qid, vec_id, "
        "CASE WHEN label = ql THEN 1 ELSE 0 END AS rel, "
        + sql_round(
            "list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe)", 6
        )
        + " AS cosine FROM embeddings CROSS JOIN qs WHERE vec_id <> qid), "
        "rk AS (SELECT qid, rel, CAST(ROW_NUMBER() OVER "
        "(PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk "
        "FROM r), "
        "ri AS (SELECT qid, rnk, CAST(ROW_NUMBER() OVER "
        "(PARTITION BY qid ORDER BY rnk) AS BIGINT) AS i FROM rk "
        "WHERE rel = 1), "
        "ap AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel, "
        "CAST(SUM(CAST(FLOOR(1000000000.0 * i / rnk + 0.5) AS BIGINT)) "
        "AS BIGINT) AS s FROM ri GROUP BY qid), "
        "apq AS (SELECT qid, n_rel, "
        "CAST(FLOOR(CAST(s AS DOUBLE) / n_rel + 0.5) AS BIGINT) AS apu "
        "FROM ap), "
        "pan AS (SELECT qid FROM qs), "
        "o AS (SELECT pan.qid, COALESCE(apq.n_rel, 0) AS n_rel, "
        "COALESCE(apq.apu, 0) AS apu FROM pan LEFT JOIN apq USING (qid)), "
        "mp AS (SELECT CAST(SUM(apu) AS BIGINT) AS mu, "
        "CAST(COUNT(*) AS BIGINT) AS nq FROM o) "
        "SELECT CAST(o.qid AS BIGINT) AS qid, CAST(o.n_rel AS BIGINT) AS n_rel, "
        + sql_round("CAST(o.apu AS DOUBLE) / 1000000000", 6) + " AS ap, "
        + sql_round("CAST(mp.mu AS DOUBLE) / 1000000000 / mp.nq", 6)
        + " AS map FROM o, mp"
    )


@query(
    "q_map",
    oracle=_map_oracle(),
    tags=("similarity", "retrieval", "metric"),
)
def q_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean average precision over the q_mrr 10-query panel (vec_id
    0..9, same-label relevance, brute-force cosine ranking): per query
    the average of precision@rank over every relevant item — with the
    i-th relevant item (rank order) sitting at overall rank r_i,
    AP = (1/R)·Σ_i i/r_i — then the panel mean (a query with no
    relevant corpus vector contributes AP = 0 but stays in the
    denominator, the q_mrr convention). Emits one row per panel query
    (qid, n_rel, ap) with the panel MAP repeated as a column — the
    broadcast-scalar pattern q_stump uses for gini_base.

    Exactness: the ranking is the proven (6-dp cosine DESC, vec_id)
    order from q_knn_cosine/q_mrr. Each relevant item's overall rank r
    and relevant-index i are EXACT INTEGERS (prefix counts + tie
    positions), so i/r is the same IEEE division on both engines; each
    term folds to 1e-9 fixed-point units BEFORE the per-query sum, the
    per-query AP folds to units before the panel mean (the q_chi2
    discipline) — no float crosses an aggregation boundary.

    Scale: NO per-query global ranking window over facts. Ranks
    decompose as r = (#rows with strictly greater 6-dp cosine) +
    (#ties with smaller vec_id) + 1: the first term is a prefix over
    the per-(qid, cosine) count table — bounded by the 6-dp cosine
    DOMAIN (≤2e6+1 rows/query), not corpus size, the q_auc argument —
    and the second is a window PARTITIONED by (qid, cosine), i.e. by
    tie group. The fact-scale work is the same broadcast-panel cosine
    pass q_mrr pays plus one (qid, cosine)-partitioned shuffle; past
    the 10-query panel both axes parallelize."""
    qs, x = _panel_relevant_ranks(spark, sf_dir)
    r_rank = F.col("r_rank")
    i_rel = F.col("i_rel")
    ap = x.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_rel"),
        F.sum(
            F.floor(F.lit(1000000000.0) * i_rel / r_rank + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("s"),
    )
    apq = ap.select(
        "qid",
        "n_rel",
        F.floor(F.col("s").cast("double") / F.col("n_rel") + F.lit(0.5))
        .cast("bigint")
        .alias("apu"),
    )
    o = (
        qs.select("qid")
        .join(F.broadcast(apq), "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("bigint").alias("n_rel"),
            F.coalesce(F.col("apu"), F.lit(0)).cast("bigint").alias("apu"),
        )
    )
    mp = o.agg(
        F.sum("apu").cast("bigint").alias("mu"),
        F.count("*").cast("bigint").alias("nq"),
    )
    return o.crossJoin(F.broadcast(mp)).select(
        F.col("qid").cast("bigint").alias("qid"),
        "n_rel",
        pround(F.col("apu").cast("double") / 1000000000, 6).alias("ap"),
        pround(
            F.col("mu").cast("double") / 1000000000 / F.col("nq"), 6
        ).alias("map"),
    )


# ---------------------------------------------------------------------------
# Recall@k / precision@k (round 11, batch 2): the operational pair a
# retrieval stack actually pages on — "of the R relevant vectors, how
# many landed in the top k" — next to the rank-weighted q_ndcg/q_mrr/
# q_map. Rides the shared _panel_relevant_ranks machinery.
# ---------------------------------------------------------------------------

_RECALL_K = 10


def _recall_oracle() -> str:
    return (
        "WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe, "
        f"label AS ql FROM embeddings WHERE vec_id < {_MRR_QUERIES}), "
        "r AS MATERIALIZED (SELECT qid, vec_id, "
        "CASE WHEN label = ql THEN 1 ELSE 0 END AS rel, "
        + sql_round(
            "list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe)", 6
        )
        + " AS cosine FROM embeddings CROSS JOIN qs WHERE vec_id <> qid), "
        "rk AS (SELECT qid, rel, CAST(ROW_NUMBER() OVER "
        "(PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk "
        "FROM r), "
        "ag AS (SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_rel, "
        f"CAST(SUM(CASE WHEN rel = 1 AND rnk <= {_RECALL_K} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS hits FROM rk GROUP BY qid) "
        # every panel query emits a row, a zero-relevant one with
        # n_rel = 0 and NULL recall (0/0 -> NULL on both engines)
        "SELECT CAST(qs.qid AS BIGINT) AS qid, "
        "COALESCE(ag.n_rel, 0) AS n_rel, COALESCE(ag.hits, 0) AS hits, "
        + sql_round(
            "CAST(COALESCE(ag.hits, 0) AS DOUBLE) / COALESCE(ag.n_rel, 0)", 6
        )
        + " AS recall_at_k, "
        + sql_round(
            f"CAST(COALESCE(ag.hits, 0) AS DOUBLE) / {_RECALL_K}", 6
        )
        + " AS precision_at_k FROM qs LEFT JOIN ag USING (qid)"
    )


@query(
    "q_recall_at_k",
    oracle=_recall_oracle(),
    tags=("similarity", "retrieval", "metric"),
)
def q_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 and precision@10 per panel query (the q_mrr/q_map
    panel: vec_id 0..9, same-label relevance, brute-force cosine
    ranking): hits = relevant vectors ranked in the top 10 under the
    proven (6-dp cosine DESC, vec_id) order, recall = hits/R,
    precision = hits/10 — the cutoff pair an embedding-retrieval
    dashboard reports next to MRR/MAP (q_knn_ivf's recall-vs-exact
    test measures the INDEX against this same notion; this measures
    the EMBEDDINGS against labels). A query with no relevant corpus
    vector divides by zero: NULL recall on both engines (DuckDB
    double x/0 and non-ANSI Spark agree).

    Exactness: ranks come from _panel_relevant_ranks — exact-integer
    prefix + tie-position decomposition of the q_knn_cosine order —
    so hits and R are exact integers; the two displayed ratios are
    identical IEEE divisions rounded at 6 dp.

    Scale: the q_map plan minus the AP folds — one broadcast-panel
    cosine pass, the domain-bounded per-(qid, cosine) prefix table,
    tie-partitioned windows, then a <=|panel| aggregate. No per-query
    global ranking window."""
    qs, x = _panel_relevant_ranks(spark, sf_dir)
    ag = x.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_rel"),
        F.sum((F.col("r_rank") <= _RECALL_K).cast("int"))
        .cast("bigint")
        .alias("hits"),
    )
    # every panel query emits a row; a zero-relevant one reads
    # n_rel = 0 with NULL recall (0/0 -> NULL on both engines)
    o = qs.select("qid").join(F.broadcast(ag), "qid", "left").select(
        "qid",
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("bigint").alias("n_rel"),
        F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
    )
    return o.select(
        F.col("qid").cast("bigint").alias("qid"),
        "n_rel",
        "hits",
        pround(F.col("hits").cast("double") / F.col("n_rel"), 6).alias(
            "recall_at_k"
        ),
        pround(F.col("hits").cast("double") / _RECALL_K, 6).alias(
            "precision_at_k"
        ),
    )


# ---------------------------------------------------------------------------
# q_ivfpq_probe_curve — probe-radius -> recall/cost curve (VERDICT r11
# #6b): the serving tuning table a 100 TB ANN deployment actually
# reads before picking nprobe.
# ---------------------------------------------------------------------------

_CURVE_PANEL = 10  # queries = vec_id 0..9 (the q_mrr panel)
_CURVE_K = 10


def _probe_curve_oracle() -> str:
    from math import comb

    cell = _cell_sql_expr()
    cos6 = sql_round("list_cosine_similarity(c.e, p.qe)", 6)
    r_cols = ", ".join(
        f"CAST(SUM(CASE WHEN ham <= {h} THEN 1 ELSE 0 END) AS BIGINT) AS r{h}"
        for h in range(_IVFPQ_PLANES + 1)
    )
    s_cols = ", ".join(
        f"CAST(SUM(CASE WHEN ham <= {h} THEN cnt ELSE 0 END) AS BIGINT) AS s{h}"
        for h in range(_IVFPQ_PLANES + 1)
    )
    rows = " UNION ALL ".join(
        f"SELECT {h} AS h, "
        f"{sum(comb(_IVFPQ_PLANES, i) for i in range(h + 1))} AS cells_probed, "
        + sql_round(
            f"(CAST(s{h} AS DOUBLE) - {_CURVE_PANEL}.0) "
            f"/ ({_CURVE_PANEL}.0 * (CAST(n AS DOUBLE) - 1.0))",
            6,
        )
        + " AS scan_frac, "
        + sql_round(
            f"CAST(r{h} AS DOUBLE) / {_CURVE_PANEL * _CURVE_K}.0", 6
        )
        + " AS recall_at_10 FROM r, s, tot"
        for h in range(_IVFPQ_PLANES + 1)
    )
    return (
        "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
        "FROM embeddings), "
        f"cells AS MATERIALIZED (SELECT vec_id, e, ({cell}) AS cell FROM base), "
        "panel AS MATERIALIZED (SELECT vec_id AS qid, e AS qe, cell AS qcell "
        f"FROM cells WHERE vec_id < {_CURVE_PANEL}), "
        "pairs AS (SELECT p.qid, c.vec_id, "
        f"{cos6} AS cos6, "
        "bit_count(xor(c.cell, p.qcell)) AS ham "
        "FROM cells c, panel p WHERE c.vec_id <> p.qid), "
        "rel AS MATERIALIZED (SELECT qid, ham FROM ("
        "SELECT qid, ham, ROW_NUMBER() OVER (PARTITION BY qid "
        "ORDER BY cos6 DESC, vec_id) AS rn FROM pairs) "
        f"WHERE rn <= {_CURVE_K}), "
        "hist AS MATERIALIZED (SELECT cell, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM cells GROUP BY cell), "
        "scans AS (SELECT bit_count(xor(h.cell, p.qcell)) AS ham, h.cnt "
        "FROM hist h, panel p), "
        "tot AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cells), "
        f"r AS MATERIALIZED (SELECT {r_cols} FROM rel), "
        f"s AS MATERIALIZED (SELECT {s_cols} FROM scans) "
        + rows
    )


@query(
    "q_ivfpq_probe_curve",
    oracle=_probe_curve_oracle(),
    tags=("similarity", "ann", "ivf", "eval"),
)
def q_ivfpq_probe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-radius tuning curve for the sign-plane IVF quantizer
    (q_knn_ivf_pq's coarse stage): for each Hamming radius h = 0..4
    over the 4-bit cells, the number of cells probed, the exact
    fraction of the (non-query) corpus those cells contain, and
    recall@10 — the share of the TRUE cosine top-10 (per the proven
    6-dp cosine + vec_id order, 10-query panel = vec_id 0..9) whose
    own cell lies within h of the query's cell. This is the
    operating-point table an ANN deployment reads to pick nprobe:
    q_knn_ivf_pq ships radius 1; this query prices every radius.

    Exactness: recall needs NO second search — a true neighbor is
    retained by radius-h probing iff ITS cell is within h, so the
    curve is exact integer counting over the ground-truth top-10
    rows (100) and the 16-row cell histogram x 10 panel cells; the
    final ratios divide exact integers cast once to double.

    100 TB shape: ONE corpus pass against the 10-row broadcast panel
    for cosines + cells; the top-10 cut uses a coarse 1e-3-bucket
    prefix (bounded <=20k-row window) to prune candidates before the
    per-qid (cosine, vec_id) window ranks a bounded remainder — never
    a window over the raw corpus; the cost axis (scan_frac) comes from
    the 16-row histogram, not a rescan. The curve rides the SAME cell
    expression as q_knn_ivf_pq / q_cell_balance, so its numbers
    describe exactly the deployed quantizer."""
    from math import comb

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    base = emb.withColumn("cell", _coarse_cell("e"))
    panel = base.filter(F.col("vec_id") < _CURVE_PANEL).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("cell").alias("qcell"),
    )
    pairs = (
        base.crossJoin(F.broadcast(panel))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            pround(cosine_to_query("e", "qe"), 6).alias("cos6"),
            F.bit_count(F.col("cell").bitwiseXOR(F.col("qcell"))).alias("ham"),
        )
    )
    # top-10 cut, scale-safe: coarse 1e-3 cosine buckets -> per-qid
    # prefix over the <=(10 x 2001)-row bucket table -> only buckets
    # that can still hold a top-10 row survive -> bounded per-qid
    # window for the exact (cos6 DESC, vec_id) row_number
    bpairs = pairs.withColumn(
        "bucket", F.floor(F.col("cos6") * 1000).cast("bigint")
    )
    bcnt = bpairs.groupBy("qid", "bucket").agg(F.count("*").alias("cnt"))
    w_b = (
        Window.partitionBy("qid")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    keep = (
        bcnt.withColumn("cum_before", F.sum("cnt").over(w_b) - F.col("cnt"))
        .filter(F.col("cum_before") < _CURVE_K)
        .select("qid", "bucket")
    )
    cand = bpairs.join(F.broadcast(keep), ["qid", "bucket"])
    w_r = Window.partitionBy("qid").orderBy(F.desc("cos6"), F.asc("vec_id"))
    rel = (
        cand.withColumn("rn", F.row_number().over(w_r))
        .filter(F.col("rn") <= _CURVE_K)
        .select("qid", "ham")
    )
    r_agg = rel.agg(
        *[
            F.sum(F.when(F.col("ham") <= h, 1).otherwise(0))
            .cast("bigint")
            .alias(f"r{h}")
            for h in range(_IVFPQ_PLANES + 1)
        ]
    )
    hist = base.groupBy("cell").agg(F.count("*").cast("bigint").alias("cnt"))
    scans = hist.crossJoin(F.broadcast(panel.select("qcell"))).select(
        F.bit_count(F.col("cell").bitwiseXOR(F.col("qcell"))).alias("ham"),
        "cnt",
    )
    s_agg = scans.agg(
        *[
            F.sum(F.when(F.col("ham") <= h, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias(f"s{h}")
            for h in range(_IVFPQ_PLANES + 1)
        ]
    )
    # corpus size folds off the 16-row histogram — no third corpus pass
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n"))
    one = r_agg.crossJoin(F.broadcast(s_agg)).crossJoin(F.broadcast(tot))
    rows = []
    for h in range(_IVFPQ_PLANES + 1):
        cp = sum(comb(_IVFPQ_PLANES, i) for i in range(h + 1))
        rows.append(
            f"{h}, {cp}, "
            f"(CAST(s{h} AS DOUBLE) - {_CURVE_PANEL}.0) "
            f"/ ({_CURVE_PANEL}.0 * (CAST(n AS DOUBLE) - 1.0)), "
            f"CAST(r{h} AS DOUBLE) / {_CURVE_PANEL * _CURVE_K}.0"
        )
    stacked = one.selectExpr(
        f"stack({_IVFPQ_PLANES + 1}, " + ", ".join(rows)
        + ") AS (h, cells_probed, scan_frac, recall_at_10)"
    )
    return stacked.select(
        F.col("h").cast("int").alias("h"),
        F.col("cells_probed").cast("int").alias("cells_probed"),
        pround(F.col("scan_frac"), 6).alias("scan_frac"),
        pround(F.col("recall_at_10"), 6).alias("recall_at_10"),
    )
